"""Device mesh and sharding helpers.

The reference has no distributed layer at all (single CUDA device,
`src/utils/configurator.py:114-118`; no torch.distributed anywhere). This
module is the green-field TPU-native replacement: a ``jax.sharding.Mesh``
over ICI with a ``data`` axis (users/interactions) and an optional ``model``
axis (embedding-table rows / item catalog), with XLA collectives inserted by
``jit`` from sharding annotations.

Conventions:
- train batches and eval user-chunks are sharded over ``data``;
- parameters are replicated by default; large embedding tables may be
  sharded over ``model`` by models that opt in;
- the interaction/adjacency index arrays are replicated (they are small
  relative to HBM and random-gathered).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(config=None, devices=None) -> Mesh:
    """Build the device mesh from ``config['mesh_shape']``.

    ``mesh_shape`` is a mapping like ``{data: 4, model: 2}``; ``null`` puts
    every visible device on the data axis. A shape covering FEWER devices
    than visible is honored on the first d*m devices — {data:1, model:1}
    is the explicit single-device baseline mesh (used by the multichip
    dryrun's control leg), not an error.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = config["mesh_shape"] if config is not None else None
    if shape:
        d = int(shape.get(DATA_AXIS, 1))
        m = int(shape.get(MODEL_AXIS, 1))
        if d * m > n:
            raise ValueError(f"mesh_shape {shape} exceeds {n} devices")
        devices = list(devices)[: d * m]
    else:
        d, m = n, 1
    dev_array = np.asarray(devices).reshape(d, m)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, rank: int = 1) -> NamedSharding:
    """Shard leading axis over the data axis."""
    spec = P(DATA_AXIS, *([None] * (rank - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree(tree, sharding):
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m


def model_axis_size(mesh: Mesh) -> int:
    return mesh.shape[MODEL_AXIS]


def shard_model_params(model, params, mesh: Mesh):
    """Row-shard embedding-table-like parameter leaves over ``model``.

    A leaf qualifies when it is 2-D and its leading dim is the user count,
    item count, or their sum (the LightGCN-pattern stacked table) and splits
    evenly over the axis. Everything else is replicated. The optimizer state
    must be (re)initialized AFTER this so the moments inherit the placement.

    SURVEY §2.5 names "model-sharded embedding tables" as a capability the
    green-field distributed layer adds over the reference (which has none).
    """
    m = model_axis_size(mesh)
    if m <= 1:
        return params
    n_items = int(model.n_items)
    table_rows = {
        int(model.n_users),
        n_items,
        int(model.n_users) + n_items,
    }
    row_sh = NamedSharding(mesh, P(MODEL_AXIS, None))
    vec_sh = NamedSharding(mesh, P(MODEL_AXIS))
    repl = NamedSharding(mesh, P())

    def place(x):
        if not hasattr(x, "ndim"):
            return x
        # 2-D tables and denoiser out-projections (n_items, hidden): the
        # item/user dim leads, so row-sharding splits the catalog
        if x.ndim == 2 and x.shape[0] in table_rows and x.shape[0] % m == 0:
            return jax.device_put(x, row_sh)
        # catalog-wide bias vectors (the DNN out_layer b of width n_items,
        # diffusion/dnn.py) follow the item-sharded activations
        if x.ndim == 1 and x.shape[0] == n_items and n_items % m == 0:
            return jax.device_put(x, vec_sh)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, params)


def item_sharded(x, mesh: Optional[Mesh]):
    """Constrain the LAST axis of ``x`` (the item catalog) over ``model``.

    The diffusion models operate on dense per-user interaction vectors of
    width n_items (reference `src/common/trainer.py:440-459`); at elec scale
    (63k items) these are the dominant activation. Laying the item axis over
    the model mesh axis keeps each chip's slice at n_items/S and lets XLA
    run the denoiser's in-projection as local partial products + psum and
    the out-projection fully locally (weights sharded by
    ``shard_model_params``). No-op off-mesh.

    The real catalogs are NOT multiples of the axis (elec n_items = 63001 =
    251²); ``with_sharding_constraint`` accepts uneven dims inside jit
    (GSPMD pads the last shard), so no divisibility gate here — only
    host-side ``device_put`` placements need even splits.
    """
    if mesh is None:
        return x
    S = mesh.shape[MODEL_AXIS]
    if S <= 1:
        return x
    spec = P(*([None] * (x.ndim - 1)), MODEL_AXIS)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def sharded_topk(scores, k: int, mesh: Mesh):
    """Distributed top-k over an item-sharded score matrix.

    ``scores`` is (B, n_items) with the item axis laid out over ``model``:
    each shard computes a LOCAL ``lax.top_k`` (n/S candidates -> k), then the
    S*k survivors are merged by one tiny global top-k — the cross-chip
    ``lax.top_k + all_gather`` merge SURVEY §2.5 calls for, instead of
    letting XLA all-gather the full score matrix.

    Returns (values, indices) exactly like ``jax.lax.top_k``.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    S = model_axis_size(mesh)
    n = scores.shape[-1]
    if S <= 1 or (n // S) < k:
        return jax.lax.top_k(scores, k)
    if n % S != 0:
        # real catalogs are not axis multiples (elec 63001 = 251²): pad with
        # -inf columns so shard_map sees even shards; padded slots can never
        # win the local top-k (k ≤ n//S real columns per shard)
        n_pad = pad_to_multiple(n, S)
        scores = jnp.pad(scores, ((0, 0), (0, n_pad - n)), constant_values=-jnp.inf)
        n = n_pad

    scores = jax.lax.with_sharding_constraint(
        scores, NamedSharding(mesh, P(None, MODEL_AXIS))
    )

    def local_topk(s):
        from genmmrec_tpu.ops.topk import grouped_topk

        v, i = grouped_topk(s, k)  # exact; avoids full-row sort per shard
        offset = jax.lax.axis_index(MODEL_AXIS) * (n // S)
        return v, i + offset

    v, i = shard_map(
        local_topk,
        mesh=mesh,
        in_specs=P(None, MODEL_AXIS),
        out_specs=P(None, MODEL_AXIS),
    )(scores)
    # v/i are (B, S*k) globally; the final merge runs on S*k values only
    vm, pos = jax.lax.top_k(v, k)
    return vm, jnp.take_along_axis(i, pos, axis=1)
