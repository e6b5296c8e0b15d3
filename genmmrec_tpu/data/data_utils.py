"""Raw-feature utilities (dormant path — ``end2end: False`` by default).

API parity with reference `src/utils/data_utils.py:22-380`, which the
reference dataset imports but never exercises with the shipped pre-extracted
``.npy`` features. Re-implemented on numpy/PIL/jax (torch-free):

- ``flat_list_of_lists`` / ``chunk_list`` / ``mk_input_group`` /
  ``repeat_tensor_rows``: grouping helpers (:22-366);
- ``mask_batch_text_tokens``: BERT-style MLM masking, key-threaded
  (:27-76);
- ``image_to_tensor`` / ``ImagePad`` / ``ImageResize`` / ``ImageNorm`` /
  ``get_imagenet_transform``: image pipeline (:77-282);
- ``load_decompress_img_from_lmdb_value``: gated on PIL (lmdb stores raw
  encoded bytes; the decode itself only needs PIL) (:367-380).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------
def flat_list_of_lists(l):
    """[[1,2], [3]] -> [1,2,3] (data_utils.py:22-24)."""
    return [item for sublist in l for item in sublist]


def chunk_list(examples, chunk_size=2, pad_to_divisible=True):
    """Split into fixed-size chunks, optionally padding the tail by cycling
    earlier examples (data_utils.py:283-308)."""
    n_examples = len(examples)
    remainder = n_examples % chunk_size
    if pad_to_divisible and remainder > 0:
        n_pad = chunk_size - remainder
        examples = list(examples) + list(examples[:n_pad])
        n_examples = len(examples)
        remainder = 0
    chunked = [examples[i : i + chunk_size] for i in range(0, n_examples, chunk_size)]
    if not pad_to_divisible and remainder > 0:
        chunked = chunked[:-1] + [examples[-remainder:]]
    return chunked


def mk_input_group(
    key_grouped_examples: dict,
    max_n_example_per_group=2,
    is_train=True,
    example_unique_key: Optional[str] = None,
):
    """Group examples per key into (key, examples-chunk) pairs
    (data_utils.py:311-345). At eval time groups are size 1."""
    input_groups = []
    for k, examples in key_grouped_examples.items():
        chunk_size = max_n_example_per_group if is_train else 1
        chunks = chunk_list(examples, chunk_size=chunk_size, pad_to_divisible=is_train)
        for c in chunks:
            input_groups.append((k, c))
    if example_unique_key is not None:
        flat = flat_list_of_lists([c for _, c in input_groups])
        n_in = len(flat_list_of_lists(list(key_grouped_examples.values())))
        n_out = len({e[example_unique_key] for e in flat})
        assert n_out <= n_in
    return input_groups


def repeat_tensor_rows(raw_tensor: jnp.ndarray, row_repeats: Sequence[int]):
    """Repeat each row k times (data_utils.py:348-364)."""
    assert len(row_repeats) == raw_tensor.shape[0]
    if all(r == 1 for r in row_repeats):
        return raw_tensor
    return jnp.repeat(raw_tensor, jnp.asarray(row_repeats), axis=0)


# ----------------------------------------------------------------------
def mask_batch_text_tokens(
    key: jax.Array,
    inputs: jnp.ndarray,
    mask_token_id: int,
    vocab_size: int,
    special_tokens_mask: Optional[jnp.ndarray] = None,
    mlm_probability: float = 0.15,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BERT MLM masking (data_utils.py:27-76): select 15% of tokens as
    prediction targets; of those, 80% -> [MASK], 10% -> random token,
    10% -> unchanged. Labels are -100 on unselected positions.

    TPU-native: the reference's in-place torch bernoulli becomes a pure
    key-threaded transform over int32 arrays.
    """
    k_sel, k_mask, k_rand, k_tok = jax.random.split(key, 4)
    inputs = jnp.asarray(inputs)
    prob = jnp.full(inputs.shape, mlm_probability)
    if special_tokens_mask is not None:
        prob = jnp.where(special_tokens_mask.astype(bool), 0.0, prob)
    masked = jax.random.bernoulli(k_sel, prob)
    labels = jnp.where(masked, inputs, -100)

    replace_mask = jax.random.bernoulli(k_mask, 0.8, inputs.shape) & masked
    out = jnp.where(replace_mask, mask_token_id, inputs)
    random_mask = (
        jax.random.bernoulli(k_rand, 0.5, inputs.shape) & masked & ~replace_mask
    )
    random_tokens = jax.random.randint(k_tok, inputs.shape, 0, vocab_size)
    out = jnp.where(random_mask, random_tokens, out)
    return out, labels


# ----------------------------------------------------------------------
def image_to_tensor(image: np.ndarray, keepdim: bool = True) -> jnp.ndarray:
    """HxW / HxWxC / BxHxWxC numpy -> CxHxW-style jnp (data_utils.py:77-113)."""
    image = np.asarray(image)
    if image.ndim == 2:
        tensor = image[None]  # 1xHxW
    elif image.ndim == 3:
        tensor = image.transpose(2, 0, 1)  # CxHxW
        if not keepdim:
            tensor = tensor[None]
    elif image.ndim == 4:
        tensor = image.transpose(0, 3, 1, 2)
        keepdim = True
    else:
        raise ValueError(f"Cannot process image with shape {image.shape}")
    return jnp.asarray(tensor if keepdim else tensor)


def get_padding(image, max_w: int, max_h: int, pad_all: bool = False):
    """(left, top, right, bottom) padding to center in max_w×max_h
    (data_utils.py:116-137)."""
    if isinstance(image, np.ndarray):
        h, w = image.shape[-2:]
    else:  # PIL
        w, h = image.size
    h_padding, v_padding = max_w - w, max_h - h
    if pad_all:
        h_padding /= 2
        v_padding /= 2
        l_pad = h_padding if h_padding % 1 == 0 else h_padding + 0.5
        t_pad = v_padding if v_padding % 1 == 0 else v_padding + 0.5
        r_pad = h_padding if h_padding % 1 == 0 else h_padding - 0.5
        b_pad = v_padding if v_padding % 1 == 0 else v_padding - 0.5
    else:
        l_pad, t_pad = 0, 0
        r_pad, b_pad = h_padding, v_padding
    return int(l_pad), int(t_pad), int(r_pad), int(b_pad)


class ImagePad:
    """Pad to max_w×max_h (data_utils.py:140-168). Accepts CxHxW numpy or
    PIL images; returns the same kind."""

    def __init__(self, max_w, max_h, fill=0, padding_mode="constant"):
        assert padding_mode in ["constant", "edge", "reflect", "symmetric"]
        self.max_w, self.max_h = max_w, max_h
        self.fill = fill
        self.padding_mode = padding_mode

    def __call__(self, img):
        left, top, right, bottom = get_padding(
            np.asarray(img) if not isinstance(img, np.ndarray) else img,
            self.max_w,
            self.max_h,
        )
        arr = np.asarray(img)
        pad_width = [(0, 0)] * (arr.ndim - 2) + [(top, bottom), (left, right)]
        kwargs = {"constant_values": self.fill} if self.padding_mode == "constant" else {}
        return np.pad(arr, pad_width, mode=self.padding_mode, **kwargs)

    def __repr__(self):
        return (
            f"{self.__class__.__name__}(max_w={self.max_w}, max_h={self.max_h}, "
            f"fill={self.fill}, padding_mode={self.padding_mode})"
        )


def get_resize_size(image, max_size: int):
    """(new_h, new_w) with the LONGER side scaled to max_size
    (data_utils.py:171-203)."""
    if isinstance(image, np.ndarray):
        height, width = image.shape[-2:]
    else:
        width, height = image.size
    if height >= width:
        ratio = width / height
        new_height = max_size
        new_width = new_height * ratio
    else:
        ratio = height / width
        new_width = max_size
        new_height = new_width * ratio
    return int(new_height), int(new_width)


class ImageResize:
    """Resize so the longer side == max_size (data_utils.py:206-243).
    Bilinear interpolation via jax.image (the reference uses
    torch.nn.functional.interpolate)."""

    def __init__(self, max_size: int, interpolation: str = "bilinear"):
        assert isinstance(max_size, int)
        self.max_size = max_size
        self.interpolation = interpolation

    def __call__(self, img):
        arr = np.asarray(img, np.float32)
        if arr.ndim == 2:
            arr = arr[None]
        elif arr.ndim == 3 and arr.shape[-1] in (1, 3, 4):
            arr = arr.transpose(2, 0, 1)  # PIL HxWxC -> CxHxW
        new_h, new_w = get_resize_size(arr, self.max_size)
        out = jax.image.resize(
            jnp.asarray(arr), (arr.shape[0], new_h, new_w), method=self.interpolation
        )
        return np.asarray(out)

    def __repr__(self):
        return f"{self.__class__.__name__}(max_size={self.max_size}, interpolation={self.interpolation})"


class ImageNorm:
    """Per-channel (x/255 - mean)/std (data_utils.py:260-280)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32).reshape(-1, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(-1, 1, 1)

    def __call__(self, img):
        arr = np.asarray(img, np.float32)
        if arr.max() > 1.0 and float(self.mean.max()) <= 1.0:
            arr = arr / 255.0
        return (arr - self.mean) / self.std


def get_imagenet_transform(min_size: int = 600, max_size: int = 1000):
    """Resize + ImageNet normalization chain (data_utils.py:246-257)."""
    if min_size != 600:
        import warnings

        warnings.warn(
            f"Warning: min_size is not used in image transform, setting min_size will have no effect."
        )
    resize = ImageResize(max_size, "bilinear")
    norm = ImageNorm(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225])
    return lambda img: norm(resize(img))


# ----------------------------------------------------------------------
def load_decompress_img_from_lmdb_value(lmdb_value: bytes):
    """Decode raw encoded image bytes (as stored in the reference's LMDB)
    to a numpy array (data_utils.py:367-380). Requires PIL."""
    import io

    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise ImportError("PIL is required to decode raw image bytes") from e
    img = Image.open(io.BytesIO(lmdb_value))
    return np.asarray(img.convert("RGB"))
