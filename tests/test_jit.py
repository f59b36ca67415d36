"""core.jit.op_jit: backend dispatch, nesting, wrapper API."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuimg.core.jit import TPU_COMPILER_OPTIONS, op_jit


def test_op_jit_basic_and_static():
    @op_jit(static_argnames=("k",))
    def f(x, k: int):
        return x * k

    out = np.asarray(f(jnp.arange(4.0), 3))
    np.testing.assert_allclose(out, [0, 3, 6, 9])


def test_op_jit_nested_inside_user_jit():
    # a user jitting over a tpuimg op must not trip the "compiler_options
    # on a nested jit" error (round 3: ops call other op_jit'd ops)
    @op_jit()
    def inner(x):
        return x + 1

    @jax.jit
    def outer(x):
        return inner(x) * 2

    assert float(outer(jnp.float32(1.0))) == 4.0


def test_op_jit_nested_op_jit():
    @op_jit()
    def inner(x):
        return x + 1

    @op_jit()
    def outer(x):
        return inner(x) * 2

    assert float(outer(jnp.float32(2.0))) == 6.0


def test_op_jit_clear_cache():
    @op_jit()
    def f(x):
        return x

    f(jnp.zeros(2))
    f.clear_cache()  # the jax.jit wrapper API tests rely on


def test_tpu_options_contain_scoped_vmem():
    # the 4K enhance pipeline needs >16M scoped vmem (core/jit.py docstring)
    assert TPU_COMPILER_OPTIONS["xla_tpu_scoped_vmem_limit_kib"] > 16 * 1024


def test_vmem_fallback_sticky():
    # the raised-limit variant costs guided r8 ~15% (vmem_limit_probe), so
    # it must engage ONLY on the vmem-stack compile failure — and then stick
    from tpuimg.core.jit import _vmem_fallback_call

    calls = []

    def plain(x):
        calls.append("plain")
        raise RuntimeError(
            "Ran out of memory in memory space vmem while allocating on "
            "stack for %guided_filter_pallas")

    def raised(x):
        calls.append("raised")
        return x + 1

    state = {"tpu": plain}
    assert _vmem_fallback_call(state, plain, raised, (1,), {}) == 2
    assert state["tpu"] is raised  # sticky: later calls skip the retry
    assert _vmem_fallback_call(state, plain, raised, (5,), {}) == 6
    assert calls == ["plain", "raised", "raised"]


def test_vmem_fallback_reraises_other_errors():
    from tpuimg.core.jit import _vmem_fallback_call
    import pytest

    def plain(x):
        raise ValueError("some unrelated failure")

    state = {"tpu": plain}
    with pytest.raises(ValueError, match="unrelated"):
        _vmem_fallback_call(state, plain, lambda x: x, (1,), {})
    assert state["tpu"] is plain  # no sticky switch on unrelated errors
