"""Minimal test-only shim of the public torch_geometric API surface the
reference models use (MessagePassing propagate/message/update, and a few
utils). Lets the parity tests import the reference's MMGCN/GRCN/DualGNN/
DRAGON/COHESION/MVGAE without the real CUDA-backed package.

Implements the documented contract only: COO edge_index with
edge_index[0]=source, edge_index[1]=target; message() kwargs resolved by
suffix (_j → gathered at source, _i → gathered at target); scatter
aggregation 'add'/'mean'/'max'; update(aggr_out, ...).
"""

from __future__ import annotations

import inspect
import sys
import types

import numpy as np
import torch


def _scatter(src, index, dim_size, reduce):
    shape = (dim_size,) + tuple(src.shape[1:])
    if reduce == "add":
        out = torch.zeros(shape, dtype=src.dtype)
        return out.index_add_(0, index, src)
    if reduce == "mean":
        out = torch.zeros(shape, dtype=src.dtype)
        out.index_add_(0, index, src)
        cnt = torch.zeros(dim_size, dtype=src.dtype).index_add_(
            0, index, torch.ones(index.shape[0], dtype=src.dtype)
        )
        return out / cnt.clamp(min=1).view(-1, *([1] * (src.dim() - 1)))
    if reduce == "max":
        out = torch.full(shape, float("-inf"), dtype=src.dtype)
        out = out.index_reduce_(0, index, src, "amax", include_self=True)
        out[out == float("-inf")] = 0.0
        return out
    raise ValueError(reduce)


class MessagePassing(torch.nn.Module):
    def __init__(self, aggr="add", flow="source_to_target", node_dim=0, **kwargs):
        super().__init__()
        self.aggr = aggr or "add"
        self.flow = flow

    def propagate(self, edge_index, size=None, **kwargs):
        if self.flow == "source_to_target":
            src_idx, dst_idx = edge_index[0], edge_index[1]
            dim_size = (size[1] if size is not None else None)
        else:
            src_idx, dst_idx = edge_index[1], edge_index[0]
            dim_size = (size[0] if size is not None else None)
        if dim_size is None:
            x = kwargs.get("x")
            dim_size = (
                x.size(0) if torch.is_tensor(x) else int(dst_idx.max()) + 1
            )

        src_size = size[0] if size is not None else dim_size

        def resolve(name):
            if name == "edge_index":
                return edge_index
            if name == "edge_index_i":  # per-edge target node index
                return dst_idx
            if name == "edge_index_j":  # per-edge source node index
                return src_idx
            if name == "size":
                return size
            if name == "size_i":
                return dim_size
            if name == "size_j":
                return src_size
            if name == "index":
                return dst_idx
            if name.endswith("_j") and name[:-2] in kwargs:
                return kwargs[name[:-2]][src_idx]
            if name.endswith("_i") and name[:-2] in kwargs:
                return kwargs[name[:-2]][dst_idx]
            if name in kwargs:
                return kwargs[name]
            raise KeyError(f"propagate cannot resolve message arg {name!r}")

        msg_params = [
            p
            for p in inspect.signature(self.message).parameters
            if p not in ("self",)
        ]
        msg = self.message(**{p: resolve(p) for p in msg_params})
        aggr_out = _scatter(msg, dst_idx, dim_size, self.aggr)

        upd_params = [
            p
            for p in inspect.signature(self.update).parameters
            if p not in ("self", "aggr_out", "inputs")
        ]
        return self.update(aggr_out, **{p: resolve(p) for p in upd_params})

    def message(self, x_j):  # default
        return x_j

    def update(self, aggr_out):  # default
        return aggr_out


def degree(index, num_nodes=None, dtype=None):
    n = num_nodes if num_nodes is not None else int(index.max()) + 1
    out = torch.zeros(n, dtype=dtype or torch.float32)
    return out.index_add_(
        0, index, torch.ones(index.shape[0], dtype=out.dtype)
    )


def remove_self_loops(edge_index, edge_attr=None):
    mask = edge_index[0] != edge_index[1]
    edge_index = edge_index[:, mask]
    if edge_attr is not None:
        edge_attr = edge_attr[mask]
    return edge_index, edge_attr


def add_self_loops(edge_index, edge_attr=None, fill_value=1.0, num_nodes=None):
    n = num_nodes if num_nodes is not None else int(edge_index.max()) + 1
    loops = torch.arange(n, dtype=edge_index.dtype).unsqueeze(0).repeat(2, 1)
    edge_index = torch.cat([edge_index, loops], dim=1)
    if edge_attr is not None:
        fill = torch.full((n,) + tuple(edge_attr.shape[1:]), fill_value, dtype=edge_attr.dtype)
        edge_attr = torch.cat([edge_attr, fill], dim=0)
    return edge_index, edge_attr


def softmax(src, index, ptr=None, num_nodes=None, dim=0):
    n = num_nodes if num_nodes is not None else int(index.max()) + 1
    shape = (n,) + tuple(src.shape[1:])
    mx = torch.full(shape, float("-inf"), dtype=src.dtype)
    mx = mx.index_reduce_(0, index, src, "amax", include_self=True)
    out = (src - mx[index]).exp()
    denom = torch.zeros(shape, dtype=src.dtype).index_add_(0, index, out)
    return out / (denom[index] + 1e-16)


def dropout_adj(edge_index, edge_attr=None, p=0.5, training=True, **kw):
    if not training or p == 0.0:
        return edge_index, edge_attr
    mask = torch.rand(edge_index.shape[1]) >= p
    edge_index = edge_index[:, mask]
    if edge_attr is not None:
        edge_attr = edge_attr[mask]
    return edge_index, edge_attr


def uniform(size, tensor):
    if tensor is not None:
        bound = 1.0 / (size ** 0.5)
        tensor.data.uniform_(-bound, bound)


def install():
    """Register shim modules in sys.modules (idempotent)."""
    if "torch_geometric" in sys.modules:
        return
    tg = types.ModuleType("torch_geometric")
    nn_mod = types.ModuleType("torch_geometric.nn")
    conv_mod = types.ModuleType("torch_geometric.nn.conv")
    inits_mod = types.ModuleType("torch_geometric.nn.inits")
    utils_mod = types.ModuleType("torch_geometric.utils")

    conv_mod.MessagePassing = MessagePassing
    nn_mod.MessagePassing = MessagePassing
    nn_mod.conv = conv_mod
    nn_mod.inits = inits_mod
    inits_mod.uniform = uniform
    utils_mod.degree = degree
    utils_mod.remove_self_loops = remove_self_loops
    utils_mod.add_self_loops = add_self_loops
    utils_mod.softmax = softmax
    utils_mod.dropout_adj = dropout_adj
    tg.nn = nn_mod
    tg.utils = utils_mod

    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = nn_mod
    sys.modules["torch_geometric.nn.conv"] = conv_mod
    sys.modules["torch_geometric.nn.inits"] = inits_mod
    sys.modules["torch_geometric.utils"] = utils_mod


# ---------------------------------------------------------------------------
# Minimal DGL shim: just enough for DiffGraph's DGLLayer (graph with
# out/in_degrees, ndata, update_all(copy_u, sum), local_scope) and
# dgl.graph construction from an edge tuple.
def install_dgl():
    if "dgl" in sys.modules:
        return

    class _Graph:
        def __init__(self, edges, num_nodes):
            self.src = edges[0].long()
            self.dst = edges[1].long()
            self.n = num_nodes
            self.ndata = {}

        def number_of_nodes(self):
            return self.n

        def out_degrees(self):
            return torch.zeros(self.n, dtype=torch.long).index_add_(
                0, self.src, torch.ones_like(self.src)
            )

        def in_degrees(self):
            return torch.zeros(self.n, dtype=torch.long).index_add_(
                0, self.dst, torch.ones_like(self.dst)
            )

        def local_scope(self):
            import contextlib

            @contextlib.contextmanager
            def scope():
                saved = dict(self.ndata)
                try:
                    yield self
                finally:
                    self.ndata = saved

            return scope()

        def update_all(self, message_func, reduce_func):
            src_field, out_field = message_func
            agg_field, dst_field = reduce_func
            assert src_field in self.ndata
            msg = self.ndata[src_field][self.src]
            out = torch.zeros(
                (self.n,) + tuple(msg.shape[1:]), dtype=msg.dtype
            ).index_add_(0, self.dst, msg)
            self.ndata[dst_field] = out

        def to(self, device):
            return self

    def graph(edges, num_nodes=None):
        src, dst = edges
        if not torch.is_tensor(src):
            src = torch.as_tensor(np.asarray(src))
            dst = torch.as_tensor(np.asarray(dst))
        n = num_nodes if num_nodes is not None else int(max(src.max(), dst.max())) + 1
        return _Graph((src, dst), n)

    fn_mod = types.ModuleType("dgl.function")
    # copy_u/sum return (field, out) tuples consumed by update_all above
    fn_mod.copy_u = lambda u, out: (u, out)
    fn_mod.sum = lambda msg, out: (msg, out)

    dgl_mod = types.ModuleType("dgl")
    dgl_mod.graph = graph
    dgl_mod.function = fn_mod
    sys.modules["dgl"] = dgl_mod
    sys.modules["dgl.function"] = fn_mod
