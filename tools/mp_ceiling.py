"""Machine-ceiling control experiment (no Spark): the same per-frame OCR
kernels under plain multiprocessing with fork-shared (copy-on-write) input.

Separates "Spark scaling" from "this VM's memory-subsystem scaling": if plain
multiprocessing flattens at the same core counts, the flattening is the
hardware, not the engine. Referenced by BENCH/BASELINE.md.

Usage: python tools/mp_ceiling.py [n_frames]
Prints one JSON line: {"frames": N, "procs": {"2": fps, ...}, ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_invoice_ocr_engine_spark.config import ExtractConfig  # noqa: E402
from ai_invoice_ocr_engine_spark import kernels as K  # noqa: E402
from ai_invoice_ocr_engine_spark.extractor import extract_media_lines  # noqa: E402

_IMGS: list[bytes] = []  # fork-shared, copy-on-write
_CFG = ExtractConfig()


def _work(rng: tuple[int, int]) -> int:
    w = K.crnn_weights(_CFG.rec.weight_seed)
    n = 0
    for i in range(rng[0], rng[1]):
        extract_media_lines(_IMGS[i], _CFG, w)
        n += 1
    return n


def main() -> int:
    import pyarrow.parquet as pq

    from bench import bench_corpus

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 2400
    _, media_path = bench_corpus()
    pf = pq.ParquetFile(media_path)
    for batch in pf.iter_batches(columns=["image"], batch_size=256):
        for b in batch.column("image"):
            _IMGS.append(b.as_py())
            if len(_IMGS) >= n_frames:
                break
        if len(_IMGS) >= n_frames:
            break

    # single-process warmup (JIT, page-in)
    _work((0, min(64, len(_IMGS))))

    # reference-architecture proxy: ThreadPoolExecutor(max_workers=4), the
    # reference engine's exact concurrency model and default
    # (/root/reference/engine.py:57-58, config.py:66), over the same kernels
    # and frames — the "reference single-node throughput" comparison row
    from concurrent.futures import ThreadPoolExecutor

    n_ref = min(2048, len(_IMGS))
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=4) as ex:
        chunks = [(i * n_ref // 4, (i + 1) * n_ref // 4) for i in range(4)]
        sum(ex.map(_work, chunks))
    ref_fps = round(n_ref / (time.time() - t0), 1)

    res: dict[str, float] = {}
    for procs in (1, 2, 8, 32):
        chunks = [
            (i * len(_IMGS) // procs, (i + 1) * len(_IMGS) // procs)
            for i in range(procs)
        ]
        ctx = mp.get_context("fork")
        t0 = time.time()
        with ctx.Pool(procs) as pool:
            done = sum(pool.map(_work, chunks))
        dt = time.time() - t0
        res[str(procs)] = round(done / dt, 1)
    out = {
        "frames": len(_IMGS),
        "reference_arch_threadpool4_fps": ref_fps,
        "frames_per_sec": res,
        "eff_2_to_8": round(res["8"] / res["2"] / 4.0, 3),
        "eff_8_to_32": round(res["32"] / res["8"] / 4.0, 3),
        "ms_per_frame_1proc": round(1000.0 / res["1"], 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    main()
