"""Backend-aware jit for the public op boundaries.

On TPU, XLA may "park" a Pallas custom-call's full operand/output arrays in
VMEM (layout S(1)) when they fit its heuristic window. The scoped-vmem
stack budget for that is 16 MiB by default, and arrays in the ~16-20 MiB
range make the compile FAIL outright ("Ran out of memory in memory space
vmem while allocating on stack for %guided_filter_pallas...") — observed
round 3 on the 4K enhance pipeline, where the general-path guided kernel's
(2176, 1792) f32 output is 16.46 MiB. Shrinking kernel strips only moves
which set of arrays gets parked; raising the scoped limit fixes the class.

``op_jit`` therefore jits twice: a plain variant for CPU (which rejects
TPU-only options) and a TPU variant with the scoped-vmem limit raised to
64 MiB (VMEM is 128 MiB on v5e; parking more arrays on-chip is a win, not a
risk). Dispatch happens per call on ``jax.default_backend()`` — the same
dynamic the ops' own impl="auto" ladders use.

Callers that wrap tpuimg ops in their OWN jax.jit inline our jit (options
dropped); such callers hitting the parking overflow must pass
``compiler_options={"xla_tpu_scoped_vmem_limit_kib": 65536}`` themselves.
"""

from __future__ import annotations

import functools

import jax

TPU_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": 65536}


def _trace_state_clean() -> bool:
    """True when not inside any jax trace (i.e. a top-level call)."""
    try:
        return jax.core.trace_state_clean()
    except AttributeError:  # private fallback for other jax versions
        from jax._src import core as _core

        return _core.trace_state_clean()


def op_jit(fn=None, *, static_argnames=()):
    """``jax.jit`` with the TPU scoped-vmem fix; drop-in for the ops layer."""
    if fn is None:
        return functools.partial(op_jit, static_argnames=static_argnames)
    cpu = jax.jit(fn, static_argnames=static_argnames)
    tpu = jax.jit(fn, static_argnames=static_argnames,
                  compiler_options=TPU_COMPILER_OPTIONS)

    @functools.wraps(fn)
    def call(*args, **kwargs):
        # nested calls (one op jitted inside another, or a user's outer jit)
        # inline and drop compiler options — and jax REJECTS options on a
        # nested jit — so the tpu variant is only used at top level
        top_level = _trace_state_clean()
        variant = (tpu if top_level and jax.default_backend() != "cpu"
                   else cpu)
        return variant(*args, **kwargs)

    def clear_cache():  # jax.jit wrapper API used by tests
        cpu.clear_cache()
        tpu.clear_cache()

    call.clear_cache = clear_cache
    return call
