"""utils coverage: checkpointing, profiling helpers, verbose solve."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from ratilqr_tpu import CrossEntropyConfig, ILEQGConfig, ileqg_solve
from ratilqr_tpu.models import lqr_problem
from ratilqr_tpu.solvers import nelder_mead, ratilqr
from ratilqr_tpu.utils.checkpoint import load_state, save_state
from ratilqr_tpu.utils.profiling import PhaseTimer, time_fn


def test_checkpoint_roundtrip_ce_state():
    cfg = CrossEntropyConfig()
    st = ratilqr.init_state(cfg)._replace(mu=jnp.asarray(3.5, jnp.float64))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ce.npz")
        save_state(path, st)
        st2 = load_state(path, ratilqr.init_state(cfg))
    assert float(st2.mu) == 3.5
    np.testing.assert_allclose(float(st2.sigma_init),
                               float(st.sigma_init))


def test_checkpoint_roundtrip_nm_state_with_none():
    cfg = __import__("ratilqr_tpu").NelderMeadConfig()
    st = nelder_mead.init_state(cfg)  # c_high/c_low are None
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "nm.npz")
        save_state(path, st)
        st2 = load_state(path, nelder_mead.init_state(cfg))
    assert st2.c_high is None and st2.c_low is None
    assert st2.theta_high_init == st.theta_high_init


def test_time_fn_fetches():
    f = jax.jit(lambda x: x * 2.0)
    stats = time_fn(f, jnp.ones(8), reps=2)
    assert stats["best"] > 0 and stats["compile"] >= stats["best"] * 0


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2


def test_verbose_solve_runs(capfd):
    prob = lqr_problem(N=5)
    res = ileqg_solve(prob, ILEQGConfig(verbose=True, iter_max=3),
                      jnp.zeros(2, jnp.float64), jnp.ones((5, 2)), 0.0)
    assert not bool(res.failed)
    jax.effects_barrier()
    out = capfd.readouterr().out
    assert "iLEQG iter" in out


def test_checkpoint_restores_float_into_none_template():
    # ADVICE r1: a checkpoint saved AFTER the NM c_high/c_low bootstrap
    # (concrete Python floats) must restore floats — not 0-d arrays — when
    # loaded against a fresh init_state() template whose slots are None.
    cfg = __import__("ratilqr_tpu").NelderMeadConfig()
    st = nelder_mead.init_state(cfg)._replace(c_high=12.5, c_low=3.25)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "nm2.npz")
        save_state(path, st)
        st2 = load_state(path, nelder_mead.init_state(cfg))
    assert isinstance(st2.c_high, float) and st2.c_high == 12.5
    assert isinstance(st2.c_low, float) and st2.c_low == 3.25


def test_checkpoint_structure_mismatch_raises():
    import pytest

    cfg = CrossEntropyConfig()
    st = ratilqr.init_state(cfg)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ce2.npz")
        save_state(path, st)
        with pytest.raises(ValueError):
            load_state(path, {"a": 1.0, "b": 2.0})  # wrong leaf count
        nm_cfg = __import__("ratilqr_tpu").NelderMeadConfig()
        with pytest.raises(ValueError, match="leaf paths"):
            # same leaf COUNT (7) but different field names
            load_state(path, nelder_mead.init_state(nm_cfg))


def test_pipelined_map_matches_serial_and_preserves_order():
    from ratilqr_tpu.utils.serving import pipelined_map

    import jax
    import jax.numpy as jnp

    @jax.jit
    def fn(x):
        return x * 2.0 + 1.0

    items = [jnp.asarray(float(i)) for i in range(11)]
    serial = [float(fn(x)) for x in items]
    for depth in (1, 3, 8, 16):
        out = [float(v) for v in pipelined_map(fn, items, depth=depth)]
        assert out == serial, (depth, out)

    # Custom fetch narrows the transfer.
    out = list(pipelined_map(fn, items, depth=4,
                             fetch=lambda r: float(r) - 1.0))
    assert out == [s - 1.0 for s in serial]

    import pytest
    with pytest.raises(ValueError):
        list(pipelined_map(fn, items, depth=0))


def test_bank_server_matches_individual_solves():
    """Padded-bank serving: per-request results identical to individual
    solves, across padding and chunking boundaries."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ratilqr_tpu import ILEQGConfig, ileqg_solve
    from ratilqr_tpu.models import lqr_problem
    from ratilqr_tpu.utils.serving import ILEQGBankServer

    prob = lqr_problem(N=6, noise=1e-2)
    cfg = ILEQGConfig(iter_max=10)
    server = ILEQGBankServer(prob, cfg, bank_size=4, depth=2)

    rng = np.random.default_rng(0)
    n_req = 10  # 2.5 banks: exercises padding AND chunk pipelining
    x0s = jnp.asarray(rng.standard_normal((n_req, 2)))
    u0s = jnp.asarray(0.1 * rng.standard_normal((n_req, 6, 2)))
    thetas = jnp.asarray(np.abs(rng.normal(0, 0.05, n_req)))

    out = server.solve_batch(x0s, u0s, thetas)
    assert out.value.shape == (n_req,)
    for i in range(n_req):
        ref = ileqg_solve(prob, cfg, x0s[i], u0s[i], thetas[i])
        np.testing.assert_allclose(np.asarray(out.value[i]),
                                   float(ref.value), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(out.l[i]),
                                   np.asarray(ref.l), rtol=1e-12)

    import pytest
    with pytest.raises(ValueError, match="disagree"):
        server.solve_batch(x0s[:3], u0s, thetas)
