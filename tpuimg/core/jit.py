"""Backend-aware jit for the public op boundaries.

On TPU, XLA may "park" a Pallas custom-call's full operand/output arrays in
VMEM (layout S(1)) when they fit its heuristic window. The scoped-vmem
stack budget for that is 16 MiB by default, and arrays in the ~16-20 MiB
range make the compile FAIL outright ("Ran out of memory in memory space
vmem while allocating on stack for %guided_filter_pallas...") — observed
round 3 on the 4K enhance pipeline, where the general-path guided kernel's
(2176, 1792) f32 output is 16.46 MiB. Shrinking kernel strips only moves
which set of arrays gets parked; raising the scoped limit fixes the class.

But raising the limit unconditionally is NOT free: the scoped-vmem A/B
probe (scripts/probes/vmem_limit_probe.py, interleaved on-chip) measured
the raised limit costing guided r8 ~15% (0.667 → 0.767 ms) and integral
~3% — XLA schedules better against its default budget, parking fewer
arrays. ``op_jit`` therefore compiles with DEFAULT options and falls back
to the raised 64 MiB limit only when the compile actually fails with the
vmem-stack overflow, caching that decision per wrapper so the retry cost
is paid once.

Callers that wrap tpuimg ops in their OWN jax.jit inline our jit (options
dropped); such callers hitting the parking overflow must pass
``compiler_options={"xla_tpu_scoped_vmem_limit_kib": 65536}`` themselves.
"""

from __future__ import annotations

import functools
import threading

import jax

TPU_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": 65536}

# Signature of the XLA compile failure the raised limit fixes (full text:
# "Ran out of memory in memory space vmem while allocating on stack ...").
# Matching the full stack-allocation phrase (not just "memory space vmem")
# keeps runtime vmem exhaustion — which the raised limit cannot fix — from
# triggering a wasted second compile (round-3 advisor finding).
_VMEM_STACK_ERR = "while allocating on stack"


def _trace_state_clean() -> bool:
    """True when not inside any jax trace (i.e. a top-level call)."""
    try:
        return jax.core.trace_state_clean()
    except AttributeError:  # private fallback for other jax versions
        from jax._src import core as _core

        return _core.trace_state_clean()


def _sig_key(args, kwargs):
    """Hashable (shapes, dtypes, statics) key: which compiled program a
    call maps to. Array-likes reduce to (shape, dtype); everything else
    (static args) is kept by repr so unhashable values can't break it."""
    def one(v):
        shp = getattr(v, "shape", None)
        if shp is not None:
            return ("arr", tuple(shp), str(getattr(v, "dtype", "?")))
        return ("static", repr(v))

    return (tuple(one(a) for a in args),
            tuple(sorted((k, one(v)) for k, v in kwargs.items())))


def _vmem_fallback_call(state, plain, raised, args, kwargs):
    """Call the plain-options variant; on the vmem-stack compile failure,
    retry with the raised-limit variant and remember the decision — keyed
    per call signature, so one oversized shape doesn't tax every other
    shape of the op with the raised limit's ~15% penalty (round-3 advisor
    finding; the measured cost lives in docs/PERFORMANCE.md)."""
    key = _sig_key(args, kwargs)
    with state["lock"]:
        use_raised = key in state["raised_sigs"]
    if use_raised:
        return raised(*args, **kwargs)
    try:
        return plain(*args, **kwargs)
    except Exception as e:  # noqa: BLE001 — filtered by message below
        if _VMEM_STACK_ERR not in str(e):
            raise
        with state["lock"]:
            state["raised_sigs"].add(key)
        return raised(*args, **kwargs)


def op_jit(fn=None, *, static_argnames=()):
    """``jax.jit`` with the TPU scoped-vmem fallback; drop-in for the ops
    layer."""
    if fn is None:
        return functools.partial(op_jit, static_argnames=static_argnames)
    plain = jax.jit(fn, static_argnames=static_argnames)
    raised = jax.jit(fn, static_argnames=static_argnames,
                     compiler_options=TPU_COMPILER_OPTIONS)
    # signatures that needed the raised limit; sticky per (shapes, statics)
    # so later calls with the same signature skip the failed compile. The
    # lock guards concurrent first calls from racing the set mutation.
    state = {"raised_sigs": set(), "lock": threading.Lock()}

    @functools.wraps(fn)
    def call(*args, **kwargs):
        # nested calls (one op jitted inside another, or a user's outer jit)
        # inline and drop compiler options — and jax REJECTS options on a
        # nested jit — so compiler options only apply at top level
        top_level = _trace_state_clean()
        if not (top_level and jax.default_backend() != "cpu"):
            return plain(*args, **kwargs)
        return _vmem_fallback_call(state, plain, raised, args, kwargs)

    def clear_cache():  # jax.jit wrapper API used by tests
        plain.clear_cache()
        raised.clear_cache()
        with state["lock"]:
            state["raised_sigs"].clear()

    call.clear_cache = clear_cache
    return call
