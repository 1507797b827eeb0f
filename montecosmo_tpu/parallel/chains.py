"""Chain parallelism via jax.sharding (replaces the reference's pmap).

Parity: reference `montecosmo/script.py:13-20` — there `map_chains` is
`pmap(fn)` when one GPU per chain is available, else `jit(vmap(fn))`.  Here
it is always `jit(vmap(fn))` with the batch axis sharded over a 'chains'
device-mesh axis: the same compiled function runs 1 chain/device, many
chains/device, or multi-host, and composes with spatial mesh sharding.
"""
from functools import partial

import numpy as np
import jax
from jax import numpy as jnp, tree_util, vmap
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from montecosmo_tpu.parallel.mesh import make_device_mesh


def map_chains(fn, n_chains, mesh: Mesh = None, devices=None):
    """vmap `fn` over a leading chains axis, sharded across devices.

    Inputs/outputs whose leading axis is the chain axis are sharded over the
    'chains' mesh axis; everything below stays replicated unless `fn`
    introduces its own shardings.
    """
    if mesh is None:
        # an active spatial mesh_context owns the devices: reuse its mesh
        # (chains sharded over its 'chains' axis if present, else replicated)
        # instead of claiming a conflicting device subset
        from montecosmo_tpu.parallel.context import current_mesh_context
        ctx = current_mesh_context()
        if ctx is not None:
            cmesh = ctx[0]
            if "chains" in cmesh.axis_names:
                mesh = cmesh
            else:
                return lambda *args: jax.jit(vmap(fn))(*args)
    if mesh is None:
        devices = np.asarray(devices if devices is not None else jax.devices())
        n_dev = int(min(n_chains, devices.size))
        while n_chains % n_dev:
            n_dev -= 1
        mesh = Mesh(devices[:n_dev].reshape(n_dev, 1), ("chains", "mesh"))

    # spmd_axis_name threads the chain axis through any shard_map islands
    # inside fn (mesh_context pencil FFTs / halo paints), so dp x sp runs as
    # ONE partitioned program instead of replicating the field per chain
    batched = vmap(fn, spmd_axis_name="chains")
    sharding = NamedSharding(mesh, P("chains"))

    def wrapped(*args):
        def shard_leaf(x):
            x = jnp.asarray(x)
            if x.ndim >= 1 and x.shape[0] == n_chains:
                spec = P("chains", *(None,) * (x.ndim - 1))
                return jax.device_put(x, NamedSharding(mesh, spec))
            return x

        args = tree_util.tree_map(shard_leaf, args)
        return jax.jit(batched)(*args)

    return wrapped
