"""Driver-contract tests for __graft_entry__ (cheap CPU versions)."""

import jax
import jax.numpy as jnp


def test_entry_traces():
    import __graft_entry__ as g
    fn, args = g.entry()
    # abstract evaluation = "does it trace/jit" without paying CPU compile
    out = jax.eval_shape(fn, *args)
    assert out.shape == (16, 1000)


def test_dryrun_multichip_small():
    import __graft_entry__ as g
    g.dryrun_multichip(4)
