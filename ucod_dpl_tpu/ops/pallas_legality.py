"""Static Mosaic block-legality validation for Pallas TPU kernels.

Round 4 shipped a kernel that was interpret-green but chip-broken: the
fused int8 LN+fc1+gelu kernel gave its per-token-scale output a ``(1, bq)``
block on a ``(B, L)`` array, which Mosaic refuses to lower for any B > 1
("the last two dimensions of your block shape [must be] divisible by 8 and
128 respectively, or be equal to the respective dimensions of the overall
array").  The Pallas interpreter never applies that rule, so the CPU suite
could not see the failure — only the driver's on-chip bench did
(BENCH_r04.json).

This module closes that hole WITHOUT TPU hardware: it intercepts every
``pl.pallas_call`` made while tracing a function, records each BlockSpec
against the shape of the array it blocks, and checks the exact rule Mosaic
enforces.  Combined with ``UCOD_ASSUME_MOSAIC=1`` (ops/attention.py), a
plain ``jax.eval_shape`` on CPU traces the very code path a real TPU takes
(Pallas on, no host padding) — abstract tracing only, nothing executes, so
the whole production shape matrix costs milliseconds per entry.

Used by tests/test_pallas_legality.py (CPU suite, every shape the serving /
cache / train paths can produce) and available to scripts for ad-hoc audits.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, List, Optional, Sequence, Tuple

import jax
from jax.experimental import pallas as pl

_SUBLANE = 8
_LANE = 128


def _dim_count(d) -> Optional[int]:
    """Block-shape entry -> int block length, or None for 'whole dimension'.

    Entries may be plain ints, None (whole dim), or pallas dimension wrappers
    (``pl.Blocked(n)`` and friends) that expose the length as an attribute.
    """
    if d is None:
        return None
    if isinstance(d, int):
        return d
    for attr in ("block_size", "size", "value"):
        v = getattr(d, attr, None)
        if isinstance(v, int):
            return v
    try:  # e.g. numpy integer
        return int(d)
    except Exception:
        return None


def block_issues(
    block_shape: Sequence[Any], array_shape: Sequence[int]
) -> List[str]:
    """Violations of Mosaic's last-two-dims rule for one (block, array) pair.

    The rule (quoted from the Mosaic lowering error itself): the last two
    dimensions of the block shape must be divisible by 8 and 128
    respectively, OR be equal to the respective dimensions of the overall
    array.  Leading (grid-major) dimensions are unconstrained.  1-D arrays
    only face the lane (last-dim) rule.
    """
    issues: List[str] = []
    bs = [_dim_count(d) for d in block_shape]
    if len(bs) != len(array_shape):
        # Pallas requires rank match; a mismatch would fail tracing first.
        return [f"rank mismatch: block {block_shape} vs array {tuple(array_shape)}"]
    if not bs:
        return issues
    checks: List[Tuple[int, int, str]] = [(bs[-1] or array_shape[-1], array_shape[-1], "lane")]
    if len(bs) >= 2:
        checks.append((bs[-2] or array_shape[-2], array_shape[-2], "sublane"))
    for blk, arr, kind in checks:
        mult = _LANE if kind == "lane" else _SUBLANE
        if blk % mult != 0 and blk != arr:
            issues.append(
                f"{kind} block dim {blk} is neither %{mult}==0 nor equal to "
                f"array dim {arr} (block {tuple(bs)} vs array {tuple(array_shape)})"
            )
    return issues


@dataclass
class PallasCallRecord:
    """One traced ``pl.pallas_call``: kernel name + (spec, array-shape) pairs."""

    kernel: str
    grid: Any
    pairs: List[Tuple[str, Any, Tuple[int, ...]]] = field(default_factory=list)

    def issues(self) -> List[str]:
        out = []
        for role, spec, shape in self.pairs:
            blk = getattr(spec, "block_shape", None)
            if spec is None or blk is None:
                continue  # whole-array spec: always legal
            for msg in block_issues(blk, shape):
                out.append(f"{self.kernel} {role}: {msg}")
        return out


def _kernel_name(kernel) -> str:
    f = getattr(kernel, "func", kernel)  # unwrap functools.partial
    return getattr(f, "__name__", repr(f))


def _as_list(x) -> list:
    if x is None:
        return []
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]


@contextlib.contextmanager
def record_pallas_calls(records: List[PallasCallRecord]):
    """Patch ``pl.pallas_call`` to append a :class:`PallasCallRecord` per
    traced call.  All repo kernels call ``pl.pallas_call`` through the
    ``pallas`` module object, so patching the module attribute covers every
    site.  The original is always restored."""
    real = pl.pallas_call

    def spy(kernel, **kw):
        inner = real(kernel, **kw)

        def wrapped(*ops):
            rec = PallasCallRecord(
                kernel=_kernel_name(kernel), grid=kw.get("grid")
            )
            for i, (spec, op) in enumerate(zip(_as_list(kw.get("in_specs")), ops)):
                rec.pairs.append((f"in[{i}]", spec, tuple(jax.numpy.shape(op))))
            outs = _as_list(kw.get("out_specs"))
            shapes = _as_list(kw.get("out_shape"))
            for i, (spec, sds) in enumerate(zip(outs, shapes)):
                rec.pairs.append((f"out[{i}]", spec, tuple(sds.shape)))
            records.append(rec)
            return inner(*ops)

        return wrapped

    pl.pallas_call = spy
    try:
        yield
    finally:
        pl.pallas_call = real


def validate_traced(
    fn: Callable, *args, _records: Optional[List[PallasCallRecord]] = None
) -> List[str]:
    """Abstractly trace ``fn(*args)`` (``jax.eval_shape`` — nothing executes,
    no compile) with pallas_call interception and return all Mosaic
    block-legality violations.  Args may be ShapeDtypeStructs or arrays.

    Callers wanting the TPU-production trace on CPU must set
    ``UCOD_ASSUME_MOSAIC=1`` BEFORE tracing (see ops/attention.py).
    """
    records: List[PallasCallRecord] = [] if _records is None else _records
    with record_pallas_calls(records):
        jax.eval_shape(fn, *args)
    issues: List[str] = []
    for rec in records:
        issues.extend(rec.issues())
    return issues
