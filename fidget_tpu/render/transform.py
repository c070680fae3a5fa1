"""Homogeneous 4x4 transform helpers for point / interval / dual planes.

The TPU analog of the reference's `Transformable` input wrapper
(fidget-core/src/shape/mod.rs:894-948): coordinates are transformed
*outside* the tape, in batched jnp ops that XLA fuses into the
surrounding pipeline, rather than by prepending ops to every tape.
"""

from __future__ import annotations

from ..compiler.tape import TapeOp


def transform_points(mat, x, y, z):
    """(x, y, z, 1) -> model (x, y, z) with perspective divide.

    All of x/y/z may be arrays or scalars (broadcast together); `mat`
    is a traced [4, 4] array.
    """

    def row(r):
        return mat[r, 0] * x + mat[r, 1] * y + mat[r, 2] * z + mat[r, 3]

    w = row(3)
    return row(0) / w, row(1) / w, row(2) / w


def transform_intervals(im, mat, xi, yi, zi):
    """Interval version. The w row goes through interval division,
    which is exact for affine matrices (w == [1, 1]) and correctly
    widens under perspective."""

    def row(r):
        mx = im.binary(TapeOp.MUL, xi, (mat[r, 0], mat[r, 0]))
        my = im.binary(TapeOp.MUL, yi, (mat[r, 1], mat[r, 1]))
        mz = im.binary(TapeOp.MUL, zi, (mat[r, 2], mat[r, 2]))
        s = im.binary(TapeOp.ADD, im.binary(TapeOp.ADD, mx, my), mz)
        return im.binary(TapeOp.ADD, s, (mat[r, 3], mat[r, 3]))

    wr = row(3)
    return tuple(im.binary(TapeOp.DIV, row(r), wr) for r in range(3))


def transform_duals(mat, x, y, z):
    """Transforms points and returns dual seeds w.r.t. the *input*
    coordinate frame, through the perspective divide.

    Returns three 4-tuples (v, d/dx, d/dy, d/dz) — the model-space
    coordinates of (x, y, z) and their Jacobian w.r.t. (x, y, z), via
    the quotient rule m_i = r_i / w:
        dm_i/dp_j = (M[i,j] * w - r_i * M[3,j]) / w^2
    """

    def row(r):
        return mat[r, 0] * x + mat[r, 1] * y + mat[r, 2] * z + mat[r, 3]

    rs = [row(i) for i in range(3)]
    w = row(3)
    inv_w2 = 1.0 / (w * w)
    out = []
    for i in range(3):
        duals = tuple(
            (mat[i, j] * w - rs[i] * mat[3, j]) * inv_w2 for j in range(3)
        )
        out.append((rs[i] / w,) + duals)
    return tuple(out)
