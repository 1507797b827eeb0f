"""Samples / Chains containers: pytree dicts with group-aware querying,
run loading, thinning, moments, and diagnostics.

Query language (parity: reference `montecosmo/chains.py:25-257`):
  s['name']            -> value
  s['group']           -> tuple of the group's values
  s['*']               -> everything
  s['*~group']         -> everything except a group/name
  s['a', '~b']         -> tuple queries with removals
  s[['a', 'b']]        -> new container restricted to keys
  s[1:3], s[idx]       -> global indexing over every leaf

`Chains` adds labels, HDF5 persistence, sequential run loading with a jitted
transform pipeline, thin/flatten/ravel, moment & ESS metrics ('n_evals' is
summed, never averaged), and native corner/trace plotting hooks (plot.py).
"""
import os
from collections import UserDict
from dataclasses import dataclass, fields
from itertools import product
from pathlib import Path

import numpy as np
from jax import flatten_util, numpy as jnp, random as jr, tree_util

from montecosmo_tpu.metrics import multi_ess, multi_gr
from montecosmo_tpu.utils.io import h5load, h5save
from montecosmo_tpu.utils.safe import nvmap

import jax


@tree_util.register_pytree_node_class
@dataclass
class Samples(UserDict):
    """Dict of arrays with group querying and global indexing.

    A query is a sequence of TOKENS evaluated left to right against an
    ordered selection (duplicates preserved — positional correspondence
    matters when two groups share a key):

      bare token   : array key -> itself; '*' -> every key; group -> members
      '~token'     : remove the token's keys from the selection so far
      '*~token'    : add the complement of the token's keys
      [tokens]     : (inside a tuple query) kept verbatim, recursed on

    str keys return values, list keys return a restricted container, tuple
    keys recurse per entry; int/slice/array keys index every leaf globally.
    """

    data: dict
    groups: dict = None  # group name -> list of keys

    # sentinel default: missing keys -> None (values) / dropped (subdicts)
    NoneOrEmpty = object()

    _INDEX_LEAVES = (int, slice, type(Ellipsis), np.ndarray, jnp.ndarray)

    def __post_init__(self):
        inherited = {}
        if isinstance(self.data, Samples):  # adopt attrs of a wrapped instance
            inner, self.data = self.data, self.data.data
            inherited = inner.asdict()
        for field in fields(self):
            given = getattr(self, field.name)
            merged = dict(inherited.get(field.name) or {})
            merged.update(given or {})
            setattr(self, field.name, merged)

    # ------------------------------------------------------------------ querying
    def _denoted(self, name):
        """Keys denoted by a bare (unprefixed) token."""
        if name in self.data:
            return [name]
        if name == "*":
            return list(self.data)
        return list(self.groups.get(name, [name]))

    def _evaluate(self, tokens):
        """Run the token sequence; returns the ordered selection."""
        chosen = []
        for tok in tokens:
            if isinstance(tok, list):     # sub-query: pass through verbatim
                chosen.append(tok)
            elif not isinstance(tok, str):
                raise KeyError(tok)
            elif tok[:2] == "*~":
                exclude = set(self._denoted(tok[2:]))
                chosen += [k for k in self.data if k not in exclude]
            elif tok[:1] == "~":
                for k in self._denoted(tok[1:]):
                    if k in chosen:
                        chosen.remove(k)  # first occurrence only
            else:
                chosen += self._denoted(tok)
        return chosen

    def _lookup(self, key, default_fn=None):
        try:
            return self.data[key]
        except KeyError:
            if default_fn is None:
                raise
            return None if default_fn is self.NoneOrEmpty else default_fn(key)

    def _restricted(self, tokens, default_fn):
        """New container limited to the selection (list-key query)."""
        keys = self._evaluate(tokens)
        if default_fn is self.NoneOrEmpty:
            picked = {k: self.data[k] for k in keys if k in self.data}
        else:
            picked = {k: self._lookup(k, default_fn) for k in keys}
        return type(self)(**{**self.asdict(), "data": picked})

    @staticmethod
    def _leaves_are(obj, types):
        return all(isinstance(leaf, types) for leaf in tree_util.tree_leaves(obj))

    def __getitem__(self, key, default_fn=None):
        if self._leaves_are(key, self._INDEX_LEAVES):
            return jax.tree.map(lambda x: x[key], self)
        if not self._leaves_are(key, str):
            raise KeyError(key)
        if isinstance(key, str):
            sel = self._evaluate([key])
            if len(sel) == 1:
                return self._lookup(sel[0], default_fn)
            return tuple(self._lookup(k, default_fn) for k in sel)
        if isinstance(key, list):
            return self._restricted(key, default_fn)
        # tuple: recurse entry-wise (entries may be sub-lists)
        sel = self._evaluate(key)
        if len(sel) == 1:
            return self.__getitem__(sel[0], default_fn)
        return tuple(self.__getitem__(k, default_fn) for k in sel)

    def get(self, key, default_fn=NoneOrEmpty):
        return self.__getitem__(key, default_fn)

    # ------------------------------------------------------------------ utils
    def asdict(self):
        return {f.name: getattr(self, f.name).copy() for f in fields(self)}

    def __copy__(self):
        return type(self)(**self.asdict())

    def copy(self):
        return self.__copy__()

    def tree_flatten(self):
        return (self.data,), (self.groups,)

    @classmethod
    def tree_unflatten(cls, aux, data):
        return cls(*data, *aux)

    # ------------------------------------------------------------------ properties
    shape = property(lambda self: jax.tree.map(jnp.shape, self.data))
    ndim = property(lambda self: jax.tree.map(jnp.ndim, self.data))
    dtype = property(lambda self: jax.tree.map(jnp.dtype, self.data))
    size = property(lambda self: jax.tree.map(jnp.size, self.data))

    # ------------------------------------------------------------------ operations
    def _merge_fields(self, other, reverse=False):
        """Field-wise dict union with `other` (a Samples or plain mapping)."""
        new = self.asdict()
        if isinstance(other, Samples):
            for name, theirs in other.asdict().items():
                ours = new.get(name, {})
                new[name] = {**theirs, **ours} if reverse else {**ours, **theirs}
        elif isinstance(other, (dict, UserDict)):
            theirs = dict(other)
            new["data"] = ({**theirs, **new["data"]} if reverse
                           else {**new["data"], **theirs})
        else:
            return None
        return new

    def __or__(self, other):
        merged = self._merge_fields(other)
        return NotImplemented if merged is None else type(self)(**merged)

    def __ror__(self, other):
        merged = self._merge_fields(other, reverse=True)
        return NotImplemented if merged is None else type(self)(**merged)

    def __ior__(self, other):
        if not isinstance(other, Samples):
            return super().__ior__(other)
        for f in fields(self):
            setattr(self, f.name,
                    {**getattr(self, f.name), **getattr(other, f.name, {})})
        return self

    # ------------------------------------------------------------------ transforms
    def prune(self):
        """Drop group entries whose keys are absent from data."""
        new = self.copy()
        new.groups = {g: [k for k in members if k in new.data]
                      for g, members in new.groups.items()}
        return new

    def concat(self, *others, axis=0):
        return jax.tree.map(lambda x, *y: jnp.concatenate((x, *y), axis=axis),
                            self, *others)

    def stackby(self, names=None, remove=True, axis=-1):
        """Stack variables by group, optionally removing the unstacked ones.

        `names` may be variable names (left untouched) or group names; None
        stacks every group.
        """
        names = list(self.groups) if names is None else list(np.atleast_1d(names))
        new = self.copy()
        for name in names:
            if name in self.data:
                continue  # a plain variable: nothing to stack
            members = self.groups[name]
            vals = self[name]  # single-member groups yield the bare value
            new.data[name] = vals if len(members) == 1 else jnp.stack(vals, axis)
            if remove:
                for member in members:
                    new.data.pop(member, None)
        return new


@tree_util.register_pytree_node_class
@dataclass
class Chains(Samples):
    """Samples + labels + run persistence + chain metrics."""

    labels: dict = None

    def tree_flatten(self):
        return (self.data,), (self.groups, self.labels)

    # ------------------------------------------------------------------ persistence
    def save(self, path):
        from montecosmo_tpu.utils.io import to_np
        h5save(path, {"data": {k: to_np(v) for k, v in self.data.items()},
                      "groups": self.groups, "labels": self.labels})

    @classmethod
    def load(cls, path):
        d = h5load(path)
        return cls(d["data"], groups=d.get("groups"), labels=d.get("labels"))

    @classmethod
    def load_runs(cls, path, start: int, end: int, transforms=None, groups=None,
                  labels=None, batch_ndim=2):
        """Load and concatenate `run_{i}.h5` files, applying a jitted transform
        pipeline to each run before concatenation (memory-bounded loading)."""
        from jax import jit

        path = Path(path)
        for i_run in range(start, end + 1):
            if not os.path.exists(path / f"run_{i_run}.h5"):
                if i_run == start:
                    raise FileNotFoundError(path / f"run_{i_run}.h5")
                end = i_run - 1
                break

        transforms = [] if transforms is None else list(np.atleast_1d(transforms))
        conc_axis = max(batch_ndim - 1, 0)

        @jit
        def transform(samples):
            for trans in transforms:
                samples = trans(samples)
            return samples

        samples = None
        for i_run in range(start, end + 1):
            part = cls(h5load(path / f"run_{i_run}.h5"), groups=groups, labels=labels)
            part = transform(part)
            if batch_ndim == 0:
                part = jax.tree.map(lambda x: x[None], part)
            samples = part if samples is None else samples.concat(part, axis=conc_axis)
        return samples

    # ------------------------------------------------------------------ general transforms
    def splitrans(self, transform, n, axis=1):
        """Apply `transform` on n splits along `axis`; stack along a new axis 0."""
        first = self.data[next(iter(self.data))]
        assert n <= np.shape(first)[axis], "n must not exceed the axis length."
        out = jax.tree.map(lambda x: jnp.array_split(x, n, axis), self)
        out = transform(out)
        for k in out:
            out.data[k] = jnp.stack(out.data[k])
        return out

    def cumtrans(self, transform, n, axis=1):
        """Apply `transform` on n cumulative prefixes along `axis`."""
        length = np.shape(self.data[next(iter(self.data))])[axis]
        ends = np.rint(np.arange(1, n + 1) / n * length).astype(int)
        acc = {k: [] for k in self.data}
        for end in ends:
            sl = axis * (slice(None),) + (slice(None, end),)
            part = jax.tree.map(lambda x: x[sl], self)
            part = transform(part)
            for k in self.data:
                acc[k].append(part[k])
        out = self.copy()
        out.data = {k: jnp.stack(v) for k, v in acc.items()}
        return out

    def choice(self, n, names=None, seed=42, batch_ndim=2, replace=False):
        """Random subsample of size n (per batch) of the selected variables."""
        names = list(self.data) if names is None else list(np.atleast_1d(names))
        if isinstance(seed, int):
            seed = jr.key(seed)
        fn = nvmap(lambda x: jr.choice(seed, x.reshape(-1), shape=(n,), replace=replace),
                   batch_ndim)
        new = self.copy()
        for k in names:
            new |= jax.tree.map(fn, new.get([k]))
        return new

    def thin(self, thinning=None, moment=None, axis: int = 1):
        """Thin along `axis` keeping the last element (or a moment) per block."""
        length = jnp.shape(next(iter(self.data.values())))[axis]
        n_split = 1 if thinning is None else max(int(np.rint(length / thinning)), 1)
        if moment is None:
            fn = lambda c: Chains.last(c, axis=axis)
        else:
            fn = lambda c: Chains.moment(c, m=moment, axis=axis)
        out = self.splitrans(fn, n_split, axis=axis)
        return jax.tree.map(lambda x: jnp.moveaxis(x, 0, axis), out)

    def flatten(self, batch_ndim=2):
        """Flatten non-batch dims into scalar keys 'name[i,j]'; update groups
        and labels accordingly."""
        data, labels, substitute = {}, {}, {}
        for k, v in self.data.items():
            shape = jnp.shape(v)[batch_ndim:]
            if len(shape) == 0:
                data[k] = v
                if k in self.labels:
                    labels[k] = self.labels[k]
            else:
                substitute[k] = []
                for ids in product(*map(range, shape)):
                    sufx = "[{}]".format(",".join(map(str, ids)))
                    data[k + sufx] = v[batch_ndim * (slice(None),) + ids]
                    if k in self.labels:
                        labels[k + sufx] = self.labels[k] + sufx
                    substitute[k].append(k + sufx)

        groups = {}
        for g, gl in self.groups.items():
            groups[g] = []
            for k in gl:
                groups[g] += substitute.get(k, [k] if k in data else [])
        return Chains(data, groups=groups, labels=labels)

    def ravel(self, batch_ndim=2):
        """Ravel into an array with `batch_ndim` leading dims + unravel fn."""
        unravel = nvmap(flatten_util.ravel_pytree(
            jax.tree.map(lambda x: x[(0,) * batch_ndim], self))[1], batch_ndim)
        raveled = nvmap(lambda x: flatten_util.ravel_pytree(x)[0], batch_ndim)(self)
        return raveled, unravel

    # ------------------------------------------------------------------ metrics
    def metric(self, fn, *others, axis=None):
        """Tree-map but treat 'n_evals' specially: summed along axis, never
        transformed (evaluation counts accumulate, they don't average)."""
        name = "n_evals"
        infos, rest = self.get(([name], ["*~" + name]))
        infos = jax.tree.map(lambda x: jnp.sum(x, axis), infos)
        others_new = (other[["*~" + name]] for other in others)
        return infos | jax.tree.map(fn, rest, *others_new)

    def last(self, axis=1):
        return self.metric(lambda x: jnp.take(x, -1, axis), axis=axis)

    def moment(self, m=(0, 1, 2), axis=1):
        if isinstance(m, int):
            fn = lambda x: jnp.sum(x**m, axis)
        else:
            m = jnp.asarray(m)
            fn = lambda x: jnp.sum(x[..., None] ** m, axis)
        return self.metric(fn, axis=axis)

    def center_moment(self, axis=-1):
        def center(moments, ax):
            moments = jnp.moveaxis(moments, ax, 0)
            count, mean = moments[0], moments[1] / moments[0]
            std = (moments[2] / count - mean**2) ** 0.5
            return jnp.stack((mean, std), ax)

        return self.metric(lambda x: center(x, axis), axis=())

    def cmoment(self, axis=1):
        return self.metric(lambda x: jnp.stack((x.mean(axis), x.std(axis)), -1),
                           axis=axis)

    def mse_cmoment(self, true_cmom, axis=None):
        """Normalized squared errors of chain mean/std vs truth (asymptotically
        chi^2(1)/n_eff per dim)."""
        cmom = self.cmoment(axis=1)
        true_cmom = Chains(true_cmom, self.groups, self.labels)

        def mse_mom(est, true, ax):
            n_chains = est.shape[0]
            est = jnp.moveaxis(est, -1, 0)
            true = jnp.moveaxis(true, -1, 0)
            sqr_mean = ((est[0] - true[0]) / true[1]) ** 2 / n_chains
            sqr_std = 2 * ((est[1] - true[1]) / true[1]) ** 2 / n_chains
            return jnp.stack((sqr_mean.mean(ax), sqr_std.mean(ax)))

        return cmom.metric(lambda x, y: mse_mom(x, y, axis), true_cmom)

    def eval_times_mse(self, truth, axis=None):
        mse_mom = self.mse_cmoment(truth, axis=axis)
        name = "n_evals"
        infos, rest = mse_mom[[name], ["*~" + name]]
        return infos | jax.tree.map(lambda x: infos[name] * x, rest)

    def multi_ess(self, axis=None):
        return self.metric(lambda x: multi_ess(x, axis=axis))

    def eval_per_ess(self, axis=None):
        ess = self.multi_ess(axis=axis)
        name = "n_evals"
        infos, rest = ess[[name], ["*~" + name]]
        return infos | jax.tree.map(lambda x: infos[name] / x, rest)

    # ------------------------------------------------------------------ reporting
    def to_getdist(self, label=None):
        """Export to a getdist MCSamples (when getdist is installed; this
        environment ships without it — use `to_arrays` + plot.corner_plot)."""
        try:
            from getdist import MCSamples
        except ImportError as e:
            raise ImportError(
                "getdist is not installed; use Chains.to_arrays() with "
                "montecosmo_tpu.plot.corner_plot for native corner plots") from e
        samples, names, labels = self.to_arrays(label)
        return MCSamples(samples=samples, names=names, labels=labels, label=label)

    def to_arrays(self, label=None):
        """Flattened (samples, names, labels) arrays for corner plotting."""
        samples, names, labels = [], [], []
        for k, v in self.data.items():
            samples.append(np.asarray(v).reshape(-1))
            names.append(k)
            labels.append(self.labels.get(k, k))
        return samples, names, labels

    def print_summary(self, group_by_chain=True):
        """Posterior summary table: mean, std, 5%/95%, n_eff, r_hat."""
        from montecosmo_tpu.metrics import effective_sample_size, gelman_rubin

        header = f"{'':>16} {'mean':>9} {'std':>9} {'5.0%':>9} {'95.0%':>9} {'n_eff':>9} {'r_hat':>7}"
        print(header)
        for k, v in self.data.items():
            v = np.asarray(v)
            if not group_by_chain:
                v = v[None]
            if v.ndim > 2:  # flatten event dims for the table
                v = v.reshape(v.shape[0], v.shape[1], -1).mean(-1)
            flat = v.reshape(-1)
            try:
                ess = float(np.asarray(effective_sample_size(jnp.asarray(v))))
                rhat = float(np.asarray(gelman_rubin(jnp.asarray(v)))) if v.shape[0] > 1 else np.nan
            except Exception:
                ess, rhat = np.nan, np.nan
            print(f"{k:>16} {flat.mean():>9.3g} {flat.std():>9.3g} "
                  f"{np.quantile(flat, 0.05):>9.3g} {np.quantile(flat, 0.95):>9.3g} "
                  f"{ess:>9.3g} {rhat:>7.3g}")

    def plot(self, names=None, batch_ndim=2, grid=True, log=False):
        """Grid of per-chain trace plots (delegates to plot.plot_chains)."""
        from montecosmo_tpu.plot import plot_chains
        return plot_chains(self, names=names, batch_ndim=batch_ndim, grid=grid, log=log)
