"""Multi-chip evidence and training: shard the data axis over a device mesh.

The reference is strictly single-process (SURVEY.md section 2.4); this module
is the systems axis the rebuild adds.  The design follows directly from the
algebra of fitc.calc_model: every global quantity is either per-row (r, s,
is) or a sum over rows (the m x m Gram statistic, the m-vector Knm'(is y),
and the scalars of l1/l2), so data parallelism is *exact* — shard X and y on
a 1-D mesh, accumulate per-shard StreamStats, psum them over ICI, and run the
O(m^3) epilogue replicated on every chip.  Gradients flow through shard_map
and psum transposes into the reverse collectives automatically, so one
jax.value_and_grad of the sharded evidence is the whole distributed training
step.

Collective volume per evidence+gradient evaluation: one psum of
(m^2 + m + 4) accumulators — at m = 300 that is ~0.7 MB, i.e. ICI latency,
not bandwidth, bound.  Nothing n-sized ever crosses the interconnect.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.fitc import calc_inducing
from ..models.streaming import (
    evidence_from_stats,
    stream_stats,
)

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first n available devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return jax.make_mesh((n_devices,), (axis,), devices=devices[:n_devices])


def pad_to_shards(mesh: Mesh, X, y):
    """Pad (X, y) to a row count divisible by the mesh size; returns
    (X, y, mask) with mask marking real rows."""
    n_dev = mesh.devices.size
    n = X.shape[0]
    pad = (-n) % n_dev
    mask = jnp.ones((n,), X.dtype)
    if pad:
        X = jnp.concatenate([X, jnp.zeros((pad, X.shape[1]), X.dtype)])
        y = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])
    return X, y, mask


def shard_batch(mesh: Mesh, X, y):
    """Place (X, y, mask) row-sharded across the mesh."""
    X, y, mask = pad_to_shards(mesh, X, y)
    row = NamedSharding(mesh, P(DATA_AXIS))
    row2 = NamedSharding(mesh, P(DATA_AXIS, None))
    return (
        jax.device_put(X, row2),
        jax.device_put(y, row),
        jax.device_put(mask, row),
    )


def sharded_log_evidence(
    family,
    mesh: Mesh,
    params,
    z,
    sigma2,
    X,
    y,
    mask=None,
    *,
    variational: bool = False,
    block_size: int = 8192,
    jitter: float | None = None,
):
    """Exact distributed evidence.  X (n, d) and y (n,) must be row-sharded
    (or at least row-shardable) over ``mesh``; params/z/sigma2 replicate.

    Per shard: scan-accumulate StreamStats over local row blocks (the Knm
    tile never leaves VMEM-scale working sets); then one psum over ICI; then
    the replicated m^3 epilogue.  Wrap in jax.value_and_grad for training.
    """
    if mask is None:
        mask = jnp.ones((X.shape[0],), X.dtype)

    def shard_fn(params, z, sigma2, xs, ys, ms):
        inducing = calc_inducing(family, params, z, jitter)
        stats = stream_stats(
            family, params, inducing, sigma2, xs, ys,
            block_size=min(block_size, xs.shape[0]), mask=ms,
        )
        stats = jax.tree.map(lambda a: jax.lax.psum(a, DATA_AXIS), stats)
        return evidence_from_stats(inducing, stats, variational=variational)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS, None), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(params, z, jnp.asarray(sigma2, X.dtype), X, y, mask)


def make_sharded_objective(
    family,
    mesh: Mesh,
    X,
    y,
    pack,
    *,
    variational: bool = False,
    block_size: int = 8192,
):
    """Jitted value-and-grad of the NEGATIVE sharded evidence over a packed
    hyper vector (see optim.pack) — the distributed training step."""
    X, y, mask = pad_to_shards(mesh, X, y)
    row = NamedSharding(mesh, P(DATA_AXIS))
    row2 = NamedSharding(mesh, P(DATA_AXIS, None))
    X = jax.device_put(X, row2)
    y = jax.device_put(y, row)
    mask = jax.device_put(mask, row)

    # Data threads through as jit arguments (closure capture would embed the
    # shards as compiled-in constants).
    @jax.jit
    def _neg_l_and_grad(xvec, X, y, mask):
        def f(xvec):
            params, z, sigma2 = pack.unpack(xvec)
            return -sharded_log_evidence(
                family, mesh, params, z, sigma2, X, y, mask,
                variational=variational, block_size=block_size,
            )

        return jax.value_and_grad(f)(xvec)

    return lambda xvec: _neg_l_and_grad(xvec, X, y, mask)
