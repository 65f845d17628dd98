"""PDF function objects (ISO 32000-1 §7.10) and CIE L*a*b* conversion —
the machinery behind Separation / DeviceN tint transforms and the Lab
colour space on the image-extraction path.

Implemented function types (the full set the spec defines):
  * Type 0 sampled: packed BitsPerSample grid, Encode/Decode mapping,
    MULTILINEAR interpolation over any input dimensionality (first
    input dimension varying fastest, §7.10.2); Order 3 (cubic spline)
    stays a loud seam — linear is what tint transforms use.
  * Type 2 exponential: C0 + x^N (C1 - C0).
  * Type 3 stitching: Bounds subdomains, per-piece Encode remap.
  * Type 4 PostScript calculator: the spec's full operator set
    (§7.10.5.2 arithmetic / stack / boolean-bitwise / conditional)
    over a brace-nested procedure, loop-free by construction.

Every function clamps inputs to Domain and outputs to Range per
§7.10.1. ``make_function`` parses once and returns a scalar callable;
image decoding vectorizes by evaluating only each image's UNIQUE
sample tuples (a document scan carries few distinct inks), so the
Python-level evaluator never runs per pixel.

Reference parity note: the reference engine (utils/image.py) leans on
cv2.imread, which never sees PDF colour spaces; this module exists for
the PDF ingest surface the brief's interleaved corpus requires.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["make_function", "lab_to_rgb255"]


def _interp(x, x0, x1, y0, y1):
    if x1 == x0:
        return y0
    return y0 + (x - x0) * (y1 - y0) / (x1 - x0)


def _pairs(vals):
    it = [float(v) for v in vals]
    return list(zip(it[0::2], it[1::2]))


# -- Type 4: PostScript calculator ------------------------------------------

_PS_BIN = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
}


def _ps_tokenize(src: str) -> list:
    """Brace-nested token tree: numbers, operator names, sub-procedures."""
    out = [[]]
    i, n = 0, len(src)
    while i < n:
        ch = src[i]
        if ch.isspace():
            i += 1
        elif ch == "{":
            out.append([])
            i += 1
        elif ch == "}":
            if len(out) < 2:
                raise ValueError("PDF type-4 function: unbalanced }")
            proc = out.pop()
            out[-1].append(proc)
            i += 1
        elif ch == "%":  # comment to end of line (PS lexical rule)
            while i < n and src[i] not in "\r\n":
                i += 1
        else:
            j = i
            while j < n and not src[j].isspace() and src[j] not in "{}%":
                j += 1
            out[-1].append(src[i:j])
            i = j
    if len(out) != 1:
        raise ValueError("PDF type-4 function: unbalanced {")
    body = out[0]
    # the stream is one outer procedure: { ... }
    if len(body) == 1 and isinstance(body[0], list):
        return body[0]
    return body


def _ps_num(tok: str) -> float | None:
    try:
        return float(tok)
    except ValueError:
        return None


def _ps_exec(proc: list, stack: list) -> None:
    """Execute one procedure over the shared operand stack. All spec
    operators (§7.10.5.2); malformed programs raise ValueError."""
    try:
        i = 0
        while i < len(proc):
            tok = proc[i]
            i += 1
            if isinstance(tok, list):
                # a literal procedure: only legal as an if/ifelse operand,
                # which consumes it by look-ahead below
                stack.append(tok)
                continue
            v = _ps_num(tok)
            if v is not None:
                stack.append(v)
                continue
            if tok == "if":
                body = stack.pop()
                cond = stack.pop()
                if not isinstance(body, list):
                    raise ValueError("if needs a procedure")
                if cond:
                    _ps_exec(body, stack)
            elif tok == "ifelse":
                els = stack.pop()
                then = stack.pop()
                cond = stack.pop()
                if not (isinstance(then, list) and isinstance(els, list)):
                    raise ValueError("ifelse needs two procedures")
                _ps_exec(then if cond else els, stack)
            elif tok == "true":
                stack.append(True)
            elif tok == "false":
                stack.append(False)
            elif tok in ("add", "sub", "mul"):
                b, a = stack.pop(), stack.pop()
                stack.append(_PS_BIN[tok](a, b))
            elif tok == "div":
                b, a = stack.pop(), stack.pop()
                stack.append(a / b)
            elif tok == "idiv":
                b, a = int(stack.pop()), int(stack.pop())
                q = abs(a) // abs(b)
                stack.append(q if (a >= 0) == (b >= 0) else -q)
            elif tok == "mod":
                b, a = int(stack.pop()), int(stack.pop())
                stack.append(int(math.fmod(a, b)))
            elif tok == "neg":
                stack.append(-stack.pop())
            elif tok == "abs":
                stack.append(abs(stack.pop()))
            elif tok == "ceiling":
                stack.append(float(math.ceil(stack.pop())))
            elif tok == "floor":
                stack.append(float(math.floor(stack.pop())))
            elif tok == "round":
                a = stack.pop()
                # PostScript rounds halves AWAY from zero
                stack.append(float(math.floor(a + 0.5) if a >= 0
                                   else math.ceil(a - 0.5)))
            elif tok == "truncate":
                stack.append(float(math.trunc(stack.pop())))
            elif tok == "sqrt":
                stack.append(math.sqrt(stack.pop()))
            elif tok == "sin":
                stack.append(math.sin(math.radians(stack.pop())))
            elif tok == "cos":
                stack.append(math.cos(math.radians(stack.pop())))
            elif tok == "atan":
                den, num = stack.pop(), stack.pop()
                ang = math.degrees(math.atan2(num, den))
                stack.append(ang + 360.0 if ang < 0 else ang)
            elif tok == "exp":
                b, a = stack.pop(), stack.pop()
                stack.append(a ** b)
            elif tok == "ln":
                stack.append(math.log(stack.pop()))
            elif tok == "log":
                stack.append(math.log10(stack.pop()))
            elif tok == "cvi":
                stack.append(int(stack.pop()))
            elif tok == "cvr":
                stack.append(float(stack.pop()))
            elif tok in ("eq", "ne", "gt", "ge", "lt", "le"):
                b, a = stack.pop(), stack.pop()
                stack.append(
                    {"eq": a == b, "ne": a != b, "gt": a > b,
                     "ge": a >= b, "lt": a < b, "le": a <= b}[tok]
                )
            elif tok in ("and", "or", "xor"):
                b, a = stack.pop(), stack.pop()
                if isinstance(a, bool) and isinstance(b, bool):
                    stack.append(
                        {"and": a and b, "or": a or b, "xor": a != b}[tok]
                    )
                else:
                    ai, bi = int(a), int(b)
                    stack.append(
                        {"and": ai & bi, "or": ai | bi, "xor": ai ^ bi}[tok]
                    )
            elif tok == "not":
                a = stack.pop()
                stack.append((not a) if isinstance(a, bool) else ~int(a))
            elif tok == "bitshift":
                s, a = int(stack.pop()), int(stack.pop())
                stack.append(a << s if s >= 0 else a >> -s)
            elif tok == "pop":
                stack.pop()
            elif tok == "exch":
                b, a = stack.pop(), stack.pop()
                stack.extend((b, a))
            elif tok == "dup":
                stack.append(stack[-1])
            elif tok == "copy":
                n = int(stack.pop())
                if n < 0 or n > len(stack):
                    raise ValueError("copy count out of range")
                if n:
                    stack.extend(stack[-n:])
            elif tok == "index":
                n = int(stack.pop())
                if n < 0 or n >= len(stack):
                    raise ValueError("index out of range")
                stack.append(stack[-1 - n])
            elif tok == "roll":
                j = int(stack.pop())
                n = int(stack.pop())
                if n < 0 or n > len(stack):
                    raise ValueError("roll count out of range")
                if n:
                    j %= n
                    if j:
                        seg = stack[len(stack) - n :]
                        del stack[len(stack) - n :]
                        stack.extend(seg[-j:] + seg[:-j])
            else:
                raise ValueError(f"PDF type-4 function: operator {tok!r}")
    except IndexError as e:
        raise ValueError("PDF type-4 function: stack underflow") from e
    except (ZeroDivisionError, OverflowError) as e:
        raise ValueError(f"PDF type-4 function: {e}") from e


# -- sampled data ------------------------------------------------------------


def _unpack_samples(raw: bytes, bps: int, count: int) -> np.ndarray:
    """count samples of bps bits (1/2/4/8/12/16/24/32), MSB-first."""
    if bps in (8, 16, 32):
        need = count * (bps // 8)
        if len(raw) < need:
            raise ValueError("PDF sampled function data truncated")
        dt = {8: ">u1", 16: ">u2", 32: ">u4"}[bps]
        return np.frombuffer(raw[:need], dt).astype(np.float64)
    if bps == 24:
        need = count * 3
        if len(raw) < need:
            raise ValueError("PDF sampled function data truncated")
        b = np.frombuffer(raw[:need], np.uint8).reshape(-1, 3).astype(np.float64)
        return b[:, 0] * 65536 + b[:, 1] * 256 + b[:, 2]
    if bps in (1, 2, 4, 12):
        need_bits = count * bps
        if len(raw) * 8 < need_bits:
            raise ValueError("PDF sampled function data truncated")
        bits = np.unpackbits(np.frombuffer(raw, np.uint8))[:need_bits]
        w = (1 << np.arange(bps - 1, -1, -1)).astype(np.float64)
        return bits.reshape(-1, bps).astype(np.float64) @ w
    raise ValueError(f"PDF sampled function BitsPerSample {bps}")


def make_function(fobj, resolve, apply_filters):
    """Parse a PDF function object into a scalar callable
    ``f(args: tuple[float]) -> tuple[float]``. ``fobj`` is either a
    dict (types 2/3) or a stream object with ``.dict``/``.raw``
    (types 0/4); ``resolve`` dereferences indirect objects and
    ``apply_filters(raw, dict, resolve)`` decodes stream data (both
    supplied by pdf.py so this module stays parser-agnostic)."""
    fobj = resolve(fobj)
    d = getattr(fobj, "dict", fobj)
    if not isinstance(d, dict):
        raise ValueError("PDF function is not a dict or stream")
    ftype = int(resolve(d.get("FunctionType", -1)))
    domain = _pairs(resolve(d.get("Domain", [])))
    if not domain:
        raise ValueError("PDF function missing /Domain")
    rng = _pairs(resolve(d.get("Range", []))) or None

    def clamp_in(args):
        if len(args) != len(domain):
            raise ValueError(
                f"PDF function arity {len(domain)}, got {len(args)}")
        return [min(max(float(a), lo), hi) for a, (lo, hi) in
                zip(args, domain)]

    def clamp_out(vals):
        if rng is None:
            return tuple(vals)
        if len(vals) != len(rng):
            raise ValueError("PDF function output arity mismatch")
        return tuple(min(max(v, lo), hi) for v, (lo, hi) in zip(vals, rng))

    if ftype == 2:
        c0 = [float(resolve(v)) for v in resolve(d.get("C0", [0.0]))]
        c1 = [float(resolve(v)) for v in resolve(d.get("C1", [1.0]))]
        nexp = float(resolve(d.get("N", 1)))
        if len(c0) != len(c1):
            raise ValueError("PDF type-2 function C0/C1 arity mismatch")

        def f2(args):
            (x,) = clamp_in(args)
            xn = x ** nexp
            return clamp_out([a + xn * (b - a) for a, b in zip(c0, c1)])

        return f2

    if ftype == 3:
        subs = [make_function(s, resolve, apply_filters)
                for s in resolve(d.get("Functions", []))]
        bounds = [float(resolve(v)) for v in resolve(d.get("Bounds", []))]
        enc = _pairs(resolve(d.get("Encode", [])))
        if len(subs) != len(bounds) + 1 or len(enc) != len(subs):
            raise ValueError("PDF type-3 function shape mismatch")
        d0, d1 = domain[0]

        def f3(args):
            (x,) = clamp_in(args)
            k = 0
            while k < len(bounds) and x >= bounds[k]:
                k += 1
            lo = d0 if k == 0 else bounds[k - 1]
            hi = d1 if k == len(bounds) else bounds[k]
            e0, e1 = enc[k]
            xe = _interp(x, lo, hi, e0, e1)
            return clamp_out(list(subs[k]((xe,))))

        return f3

    if ftype == 0:
        if not hasattr(fobj, "raw"):
            raise ValueError("PDF type-0 function requires a stream")
        if rng is None:
            raise ValueError("PDF type-0 function missing /Range")
        order = int(resolve(d.get("Order", 1)))
        if order not in (1, 3):
            raise ValueError(f"PDF type-0 function Order {order}")
        if order == 3:
            raise NotImplementedError(
                "PDF type-0 function cubic-spline Order 3 unsupported")
        size = [int(resolve(v)) for v in resolve(d.get("Size", []))]
        if len(size) != len(domain) or any(s < 1 for s in size):
            raise ValueError("PDF type-0 function /Size mismatch")
        bps = int(resolve(d.get("BitsPerSample", 0)))
        enc = _pairs(resolve(d.get("Encode", []))) or [
            (0.0, float(s - 1)) for s in size]
        dec = _pairs(resolve(d.get("Decode", []))) or list(rng)
        if len(enc) != len(size) or len(dec) != len(rng):
            raise ValueError("PDF type-0 function Encode/Decode mismatch")
        n_out = len(rng)
        total = 1
        for s in size:
            total *= s
        flat = _unpack_samples(
            apply_filters(fobj.raw, d, resolve), bps, total * n_out)
        # first input dimension varies fastest (§7.10.2); outputs are
        # innermost of all
        grid = flat.reshape(tuple(reversed(size)) + (n_out,))
        maxv = float((1 << bps) - 1)
        m = len(size)

        def f0(args):
            xs = clamp_in(args)
            fracs, bases = [], []
            for i, x in enumerate(xs):
                e = _interp(x, domain[i][0], domain[i][1],
                            enc[i][0], enc[i][1])
                e = min(max(e, 0.0), float(size[i] - 1))
                b = min(int(e), size[i] - 2) if size[i] > 1 else 0
                bases.append(b)
                fracs.append(e - b if size[i] > 1 else 0.0)
            out = [0.0] * n_out
            for corner in range(1 << m):
                wgt = 1.0
                idx = []
                for i in range(m):
                    hi_corner = (corner >> i) & 1
                    wgt *= fracs[i] if hi_corner else (1.0 - fracs[i])
                    idx.append(min(bases[i] + hi_corner, size[i] - 1))
                if wgt == 0.0:
                    continue
                cell = grid[tuple(reversed(idx))]
                for j in range(n_out):
                    out[j] += wgt * float(cell[j])
            return clamp_out([
                _interp(v, 0.0, maxv, dec[j][0], dec[j][1])
                for j, v in enumerate(out)
            ])

        return f0

    if ftype == 4:
        if not hasattr(fobj, "raw"):
            raise ValueError("PDF type-4 function requires a stream")
        if rng is None:
            raise ValueError("PDF type-4 function missing /Range")
        src = apply_filters(fobj.raw, d, resolve).decode("latin-1")
        proc = _ps_tokenize(src)
        n_out = len(rng)

        def f4(args):
            stack = list(clamp_in(args))
            _ps_exec(proc, stack)
            if len(stack) < n_out:
                raise ValueError(
                    "PDF type-4 function returned too few values")
            vals = stack[-n_out:]
            if any(isinstance(v, list) for v in vals):
                raise ValueError("PDF type-4 function returned a procedure")
            return clamp_out([float(v) for v in vals])

        return f4

    raise ValueError(f"PDF FunctionType {ftype} unknown")


# -- CIE L*a*b* --------------------------------------------------------------


def lab_to_rgb255(lab: np.ndarray, whitepoint) -> np.ndarray:
    """(…, 3) float L*a*b* → (…, 3) uint8 sRGB. CIE inverse-f transfer
    (the spec's §8.6.5.4 g function) to XYZ under the given WhitePoint,
    then the standard XYZ→linear-sRGB matrix and sRGB gamma encoding.
    No chromatic adaptation between the stream's whitepoint and sRGB's
    D65 — documented simplification, exact for neutral axis colours."""
    lab = np.asarray(lab, np.float64)
    xw, yw, zw = (float(whitepoint[0]), float(whitepoint[1]),
                  float(whitepoint[2]))
    fy = (lab[..., 0] + 16.0) / 116.0
    fx = fy + lab[..., 1] / 500.0
    fz = fy - lab[..., 2] / 200.0

    def g(t):
        return np.where(t >= 6.0 / 29.0, t ** 3,
                        3.0 * (6.0 / 29.0) ** 2 * (t - 4.0 / 29.0))

    x, y, z = xw * g(fx), yw * g(fy), zw * g(fz)
    r = 3.2406 * x - 1.5372 * y - 0.4986 * z
    gch = -0.9689 * x + 1.8758 * y + 0.0415 * z
    b = 0.0557 * x - 0.2040 * y + 1.0570 * z
    lin = np.clip(np.stack([r, gch, b], axis=-1), 0.0, 1.0)
    srgb = np.where(lin <= 0.0031308, 12.92 * lin,
                    1.055 * lin ** (1.0 / 2.4) - 0.055)
    return np.clip(np.rint(srgb * 255.0), 0, 255).astype(np.uint8)
