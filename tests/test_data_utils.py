"""data_utils (dormant raw-feature path): parity of the grouping, MLM
masking, and image transform helpers with the reference semantics."""

import io

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.data import data_utils as du


def test_flat_and_chunk():
    assert du.flat_list_of_lists([[1, 2], [3]]) == [1, 2, 3]
    assert du.chunk_list([1, 2, 3], 2, pad_to_divisible=True) == [[1, 2], [3, 1]]
    assert du.chunk_list([1, 2, 3], 2, pad_to_divisible=False) == [[1, 2], [3]]


def test_mk_input_group():
    groups = du.mk_input_group({"a": [1, 2, 3], "b": [4]}, max_n_example_per_group=2)
    keys = [k for k, _ in groups]
    assert keys.count("a") == 2 and keys.count("b") == 1
    for _, c in groups:
        assert len(c) == 2
    # eval mode: singleton groups, no padding
    ev = du.mk_input_group({"a": [1, 2, 3]}, 2, is_train=False)
    assert all(len(c) == 1 for _, c in ev) and len(ev) == 3


def test_repeat_tensor_rows():
    x = jnp.arange(6).reshape(3, 2)
    out = du.repeat_tensor_rows(x, [1, 2, 1])
    assert out.shape == (4, 2)
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(out[2]))


def test_mlm_masking_stats():
    key = jax.random.PRNGKey(0)
    inputs = jnp.ones((64, 128), jnp.int32) * 7
    out, labels = du.mask_batch_text_tokens(key, inputs, mask_token_id=103, vocab_size=1000)
    sel = np.asarray(labels != -100)
    frac = sel.mean()
    assert 0.10 < frac < 0.20  # ~15% selected
    out_np = np.asarray(out)
    masked_frac = (out_np[sel] == 103).mean()
    assert 0.7 < masked_frac < 0.9  # ~80% of selected -> [MASK]
    # unselected positions unchanged
    assert (out_np[~sel] == 7).all()
    # special tokens never selected
    special = jnp.zeros_like(inputs).at[:, 0].set(1)
    _, labels2 = du.mask_batch_text_tokens(
        key, inputs, 103, 1000, special_tokens_mask=special
    )
    assert (np.asarray(labels2)[:, 0] == -100).all()


def test_image_pipeline():
    img = np.random.default_rng(0).integers(0, 255, (40, 30, 3), np.uint8)
    t = du.image_to_tensor(img)
    assert t.shape == (3, 40, 30)

    resized = du.ImageResize(50)(img)
    assert resized.shape == (3, 50, 37)  # longer side -> 50

    padded = du.ImagePad(64, 64)(resized)
    assert padded.shape == (3, 64, 64)

    norm = du.ImageNorm(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225])
    normed = norm(du.ImageResize(50)(img))
    assert np.isfinite(normed).all() and abs(float(normed.mean())) < 3.0

    chain = du.get_imagenet_transform()
    out = chain(img)
    assert out.shape[0] == 3 and out.shape[1] == 1000 or out.shape[1] <= 1000


def test_lmdb_value_decode():
    from PIL import Image

    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (16, 16, 3), np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    arr = du.load_decompress_img_from_lmdb_value(buf.getvalue())
    assert arr.shape == (16, 16, 3)
