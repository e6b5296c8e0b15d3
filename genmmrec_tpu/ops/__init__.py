from genmmrec_tpu.ops.graph import (
    SparseGraph,
    bipartite_norm_adj,
    spmm,
    spmm_multi,
    build_sim,
    knn_graph_dense,
    knn_graph_sparse,
    norm_laplacian_dense,
    edge_dropout,
)
