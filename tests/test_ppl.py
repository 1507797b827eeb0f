"""Effect-handler PPL semantics and log_density correctness."""
import numpy as np
import jax
from jax import numpy as jnp, random as jr

from montecosmo_tpu.models import ppl
from montecosmo_tpu.models.distributions import Normal


def model():
    x = ppl.sample("x", Normal(0.0, 1.0))
    y = ppl.sample("y", Normal(x, 2.0))
    z = ppl.deterministic("z", x + y)
    return z


def test_trace_records_sites():
    tr = ppl.trace(ppl.seed(model, jr.key(0))).get_trace()
    assert set(tr) == {"x", "y", "z"}
    assert tr["x"]["type"] == "sample"
    assert tr["z"]["type"] == "deterministic"
    np.testing.assert_allclose(tr["z"]["value"], tr["x"]["value"] + tr["y"]["value"])


def test_seed_reproducible():
    t1 = ppl.trace(ppl.seed(model, jr.key(7))).get_trace()
    t2 = ppl.trace(ppl.seed(model, jr.key(7))).get_trace()
    np.testing.assert_allclose(t1["x"]["value"], t2["x"]["value"])


def test_condition_fixes_values():
    cond = ppl.condition(ppl.seed(model, jr.key(0)), data={"x": 3.0})
    tr = ppl.trace(cond).get_trace()
    assert float(tr["x"]["value"]) == 3.0
    assert tr["x"]["is_observed"]


def test_substitute_applies_to_deterministic():
    sub = ppl.substitute(ppl.seed(model, jr.key(0)), data={"z": -1.0})
    tr = ppl.trace(sub).get_trace()
    assert float(tr["z"]["value"]) == -1.0
    # condition must NOT touch deterministic sites
    cond = ppl.condition(ppl.seed(model, jr.key(0)), data={"z": -1.0})
    tr2 = ppl.trace(cond).get_trace()
    assert float(tr2["z"]["value"]) != -1.0


def test_block_hides_sites():
    blocked = ppl.block(ppl.seed(model, jr.key(0)),
                        hide_fn=lambda m: m["type"] == "deterministic")
    tr = ppl.trace(blocked).get_trace()
    assert set(tr) == {"x", "y"}
    tr = ppl.trace(ppl.block(ppl.seed(model, jr.key(0)), expose=["y"])).get_trace()
    assert set(tr) == {"y"}


def test_log_density_matches_analytic():
    params = {"x": 1.0, "y": 2.0}
    ld, tr = ppl.log_density(model, (), {}, params)
    expect = (Normal(0.0, 1.0).log_prob(1.0) + Normal(1.0, 2.0).log_prob(2.0))
    np.testing.assert_allclose(float(ld), float(expect), rtol=1e-6)


def test_log_density_jit_and_grad():
    f = jax.jit(lambda p: ppl.log_density(model, (), {}, p)[0])
    g = jax.grad(lambda p: ppl.log_density(model, (), {}, p)[0])(
        {"x": jnp.asarray(1.0), "y": jnp.asarray(2.0)})
    # d/dx [-x^2/2 - (y-x)^2/8] = -x + (y-x)/4 = -1 + 0.25
    np.testing.assert_allclose(float(g["x"]), -0.75, rtol=1e-5)
    assert np.isfinite(float(f({"x": 1.0, "y": 2.0})))


def test_compute_log_probs_per_site():
    lps, tr = ppl.compute_log_probs(model, (), {}, {"x": 0.5, "y": 0.0},
                                    sum_log_prob=False)
    assert set(lps) == {"x", "y"}
    np.testing.assert_allclose(float(lps["x"]), float(Normal(0., 1.).log_prob(0.5)),
                               rtol=1e-6)
