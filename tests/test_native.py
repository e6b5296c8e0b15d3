"""Native C++ runtime vs numpy reference implementations."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def lib():
    from genmmrec_tpu import native

    lib = native.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable (no g++)")
    return native


def test_tsv_parse(tmp_path, lib):
    path = tmp_path / "t.inter"
    path.write_text(
        "userID\titemID\trating\ttimestamp\tx_label\n"
        "0\t5\t4.0\t123\t0\n"
        "1\t7\t5.0\t124\t1\n"
        "2\t9\t3.5\t125\t2\n"
    )
    out = lib.parse_inter_tsv(
        str(path),
        ["userID", "itemID", "rating", "timestamp", "x_label"],
        "userID", "itemID", "x_label", "rating",
    )
    users, items, labels, ratings = out
    np.testing.assert_array_equal(users, [0, 1, 2])
    np.testing.assert_array_equal(items, [5, 7, 9])
    np.testing.assert_array_equal(labels, [0, 1, 2])
    np.testing.assert_allclose(ratings, [4.0, 5.0, 3.5])


def test_padded_history_matches_numpy(lib):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 20, 200).astype(np.int32)
    vals = rng.integers(0, 50, 200).astype(np.int32)
    out, lens = lib.padded_history(ids, vals, 20, pad_value=50)
    for r in range(20):
        expect = np.sort(vals[ids == r])
        np.testing.assert_array_equal(out[r, : lens[r]], expect)
        assert (out[r, lens[r] :] == 50).all()


def test_cooccur_topk_matches_dense(lib):
    rng = np.random.default_rng(1)
    n_u, n_i = 12, 8
    left = rng.integers(0, n_u, 80).astype(np.int32)
    right = rng.integers(0, n_i, 80).astype(np.int32)
    # dedup pairs (counts are over unique membership per pair occurrence)
    nbrs, wts = lib.cooccur_topk(left, right, n_u, n_i, k=3)
    # dense check
    R = np.zeros((n_u, n_i))
    np.add.at(R, (left, right), 1.0)
    co = R @ R.T
    np.fill_diagonal(co, 0)
    for u in range(n_u):
        order = np.argsort(-co[u], kind="stable")
        expected_top = co[u][order[:3]]
        got = np.sort(wts[u])[::-1][: (co[u] > 0).sum()][:3]
        # weights are raw multi-counts; compare the count multiset for the
        # top entries (note co counts pair products, native counts edge hops
        # — equal when edges are multiplicities)
        assert got[0] == expected_top[0]


def test_dataset_native_parse_roundtrip(tmp_path, lib):
    """RecDataset with a real .inter file goes through the native parser."""
    import jax  # noqa: F401  (conftest forces cpu)

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.dataset import RecDataset

    data_dir = tmp_path / "tiny"
    data_dir.mkdir()
    lines = ["userID\titemID\trating\tx_label"]
    rng = np.random.default_rng(0)
    for u in range(16):
        for it in rng.choice(12, 4, replace=False):
            lab = rng.integers(0, 3)
            lines.append(f"{u}\t{it}\t5.0\t{lab}")
    (data_dir / "tiny.inter").write_text("\n".join(lines) + "\n")

    config = Config(
        "BPR", "tiny", {"data_path": str(tmp_path) + "/", "save_recommended_topk": False}
    )
    ds = RecDataset(config)
    assert len(ds) == 64
    assert ds.user_num == 16
