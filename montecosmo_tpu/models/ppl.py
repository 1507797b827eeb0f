"""Minimal probabilistic-programming layer: effect handlers over pure
generative functions.

Replaces the numpyro dependency of the reference model layer
(`montecosmo/model.py:262-434` builds on numpyro.handlers): the same
primitives (`sample`, `deterministic`) and handler algebra (`seed`, `trace`,
`condition`, `substitute`, `block`) with identical composition semantics,
implemented as a ~150-line handler stack.  Everything is jit/vmap/grad
compatible: handlers only reorganize Python control flow at trace time.

Design notes
------------
* A site message is a dict {type, name, fn, value, is_observed, hidden}.
* Handlers are applied outermost-last: `condition(seed(model))` means seed
  wraps model first.  Each `sample` call walks the stack innermost-first.
* `log_density(model, args, kwargs, params)` substitutes `params` and sums
  `log_prob` over every sample site — the joint log-probability density.
"""
from contextlib import contextmanager

from jax import numpy as jnp, random as jr

_STACK = []


class Messenger:
    """Base effect handler: wraps a model callable and intercepts its sites."""

    def __init__(self, fn=None):
        self.fn = fn

    def __enter__(self):
        _STACK.append(self)
        return self

    def __exit__(self, *exc):
        assert _STACK[-1] is self
        _STACK.pop()

    def process_message(self, msg):
        pass

    def postprocess_message(self, msg):
        pass

    def __call__(self, *args, **kwargs):
        with self:
            return self.fn(*args, **kwargs)


def _apply_stack(msg):
    # innermost handlers see the message first
    for handler in reversed(_STACK):
        handler.process_message(msg)
    if msg["value"] is None and msg["type"] == "sample":
        if msg["key"] is None:
            raise RuntimeError(
                f"Site '{msg['name']}' has no value: wrap the model in seed() "
                "or provide the value via condition/substitute.")
        msg["value"] = msg["fn"].sample(msg["key"])
    for handler in _STACK:
        handler.postprocess_message(msg)
    return msg


def sample(name, fn, obs=None):
    """Declare a random site with distribution `fn`; returns its value."""
    if not _STACK:  # no handlers: behave as the prior with a fixed seed
        return fn.sample(jr.key(0)) if obs is None else obs
    msg = dict(type="sample", name=name, fn=fn, value=obs,
               is_observed=obs is not None, key=None, hidden=False)
    return _apply_stack(msg)["value"]


def deterministic(name, value):
    """Register a deterministic site (recorded in traces); returns `value`."""
    if not _STACK:
        return value
    msg = dict(type="deterministic", name=name, fn=None, value=value,
               is_observed=False, key=None, hidden=False)
    return _apply_stack(msg)["value"]


# ----------------------------------------------------------------------- handlers
class seed(Messenger):
    """Provide fresh PRNG keys to sample sites (split per site)."""

    def __init__(self, fn=None, rng_seed=0):
        super().__init__(fn)
        if isinstance(rng_seed, int):
            rng_seed = jr.key(rng_seed)
        self.key = rng_seed

    def process_message(self, msg):
        if msg["type"] == "sample" and msg["value"] is None and msg["key"] is None:
            self.key, msg["key"] = jr.split(self.key)


class trace(Messenger):
    """Record every (non-hidden) site into an ordered dict."""

    def __init__(self, fn=None):
        super().__init__(fn)
        self._trace = None

    def postprocess_message(self, msg):
        if not msg["hidden"]:
            self._trace[msg["name"]] = dict(msg)

    def get_trace(self, *args, **kwargs):
        self._trace = {}
        self(*args, **kwargs)
        return self._trace

    def __call__(self, *args, **kwargs):
        self._trace = {} if self._trace is None else self._trace
        with self:
            out = self.fn(*args, **kwargs)
        return out


class condition(Messenger):
    """Fix sample sites to observed values (marks them observed)."""

    def __init__(self, fn=None, data=None):
        super().__init__(fn)
        self.data = data or {}

    def process_message(self, msg):
        if msg["type"] == "sample" and msg["name"] in self.data:
            msg["value"] = self.data[msg["name"]]
            msg["is_observed"] = True


class substitute(Messenger):
    """Fix sites to values without marking them observed (also applies to
    deterministic sites, unlike condition)."""

    def __init__(self, fn=None, data=None):
        super().__init__(fn)
        self.data = data or {}

    def process_message(self, msg):
        if msg["name"] in self.data:
            msg["value"] = self.data[msg["name"]]


class block(Messenger):
    """Selectively hide sites from enclosing traces.

    Precedence: hide_fn > hide > expose_types > expose.
    """

    def __init__(self, fn=None, hide_fn=None, hide=None, expose_types=None,
                 expose=None):
        super().__init__(fn)
        if hide_fn is not None:
            self.hide_fn = hide_fn
        elif hide is not None:
            self.hide_fn = lambda msg: msg["name"] in hide
        elif expose_types is not None:
            self.hide_fn = lambda msg: msg["type"] not in expose_types
        elif expose is not None:
            self.hide_fn = lambda msg: msg["name"] not in expose
        else:
            self.hide_fn = lambda msg: True

    def process_message(self, msg):
        if self.hide_fn(msg):
            msg["hidden"] = True


# ----------------------------------------------------------------------- densities
def log_density(model, model_args, model_kwargs, params, zero_point=None):
    """Joint log-density of the model at `params` (all sites substituted).

    Returns (log_joint, trace) like numpyro's `log_density`.

    `zero_point` (optional dict site name -> scalar) recentres each site's
    ELEMENTWISE log-probs before the reduction: sum(lp - c) instead of
    sum(lp).  The result shifts by the constant sum(numel*c) — posterior and
    gradients are untouched — but the reduction now accumulates O(1)-
    magnitude terms instead of an O(N)-magnitude total, so the float32
    quantization of the returned value drops from ~eps*N*|mean lp| to
    ~eps*sqrt(N).  Samplers that difference log-densities (MCLMC energy
    control, MH accepts) need this at large mesh sizes; the f64 reference
    implementation doesn't (its eps is 2^-52).
    """
    tr = trace(substitute(seed(model, jr.key(0)), data=params)).get_trace(
        *model_args, **model_kwargs)
    log_joint = 0.0
    for name, site in tr.items():
        if site["type"] == "sample":
            lp = site["fn"].log_prob(site["value"])
            c = None if zero_point is None else zero_point.get(name)
            log_joint += jnp.sum(lp if c is None else lp - c)
    return log_joint, tr


def compute_log_probs(model, model_args, model_kwargs, params, sum_log_prob=True):
    """Per-site log-probabilities at `params`.

    Returns (dict of per-site log_prob arrays (or sums), trace).
    """
    tr = trace(substitute(seed(model, jr.key(0)), data=params)).get_trace(
        *model_args, **model_kwargs)
    out = {}
    for name, site in tr.items():
        if site["type"] == "sample":
            lp = site["fn"].log_prob(site["value"])
            out[name] = jnp.sum(lp) if sum_log_prob else lp
    return out, tr
