"""Probe: planar bit-unpack inside a Mosaic kernel (shift + lane concat).

The interleaved unpack ((bt, tn/8, 8) -> (bt, tn) reshape) is rejected by
Mosaic (minor-dim collapse of 8). Planar layout: within each TN-lane tile,
byte j holds bits k for item k*(TN/8)+j, so unpack = 8 shift-and passes
concatenated along lanes at TN/8 (=1024, 128-aligned) offsets.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TN = 8192
BT = 256


def pack_planar(mask: np.ndarray, tn: int = TN) -> np.ndarray:
    """(B, n_full) bool, n_full % tn == 0 -> (B, n_full//8) uint8 planar."""
    b, n = mask.shape
    assert n % tn == 0
    m4 = mask.reshape(b, n // tn, 8, tn // 8)
    return np.packbits(m4, axis=2, bitorder="little").reshape(b, n // 8)


def kern(m_ref, o_ref):
    m32 = m_ref[:].astype(jnp.int32)          # (BT, TN//8)
    pieces = [((m32 >> k) & 1) for k in range(8)]
    bits = jnp.concatenate(pieces, axis=1)     # (BT, TN) planar order
    o_ref[:] = bits.astype(jnp.float32)


def main():
    rng = np.random.default_rng(0)
    mask = rng.random((BT, TN)) < 0.3
    pm = jnp.asarray(pack_planar(mask))
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((BT, TN), jnp.float32)
    )(pm)
    # planar order: lane l = k*(TN/8)+j holds mask[:, l] directly by design
    ok = np.array_equal(np.asarray(out) != 0, mask)
    print("planar unpack:", "OK" if ok else "MISMATCH")
    return ok


if __name__ == "__main__":
    import sys
    sys.exit(0 if main() else 1)
