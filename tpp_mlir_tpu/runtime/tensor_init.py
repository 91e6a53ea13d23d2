"""Deterministic tensor initializers — the TensorInit equivalent.

The reference's TensorInit (lib/TPP/Transforms/Utils/TensorInit.h:81-90)
provides const/simple/cont/rand/normal deterministic initializers selected by
`tpp-run -init-type` and seeded by `-seed`, so FileCheck can assert printed
values. Same families here (deterministic per seed via numpy Generator;
value recipes are our own, not bit-identical to the reference's C++).
"""

from __future__ import annotations

import numpy as np

INIT_KINDS = ("zero", "const", "simple", "cont", "rand", "normal", "identity")


def tensor_init(kind: str, shape, dtype: str = "f32", seed: int = 0,
                value: float = 1.0) -> np.ndarray:
    np_dtype = {"f32": np.float32, "bf16": "bfloat16", "f16": np.float16,
                "i32": np.int32, "i8": np.int8}.get(dtype, np.float32)
    if np_dtype == "bfloat16":
        try:
            import ml_dtypes
            np_dtype = ml_dtypes.bfloat16
        except ImportError:
            np_dtype = np.float32
    shape = tuple(shape)
    n = int(np.prod(shape)) if shape else 1
    if kind == "zero":
        out = np.zeros(n, np.float32)
    elif kind == "const":
        out = np.full(n, value, np.float32)
    elif kind == "simple":
        # cyclic 0.3/0.6/0.9 pattern (three decimal values, like the
        # reference's 'simple' init)
        out = ((np.arange(n) % 3 + 1) * 0.3).astype(np.float32)
    elif kind == "cont":
        out = (np.arange(n, dtype=np.float32) / max(n, 1))
    elif kind == "rand":
        out = np.random.default_rng(seed).random(n, np.float32)
    elif kind == "normal":
        out = np.random.default_rng(seed).standard_normal(n).astype(np.float32)
    elif kind == "identity":
        assert len(shape) == 2 and shape[0] == shape[1]
        return np.eye(shape[0], dtype=np_dtype)
    else:
        raise ValueError(f"unknown init kind {kind!r} "
                         f"(expected one of {INIT_KINDS})")
    return out.reshape(shape).astype(np_dtype)


def apply_pack_recipe(arr: np.ndarray, attrs: dict) -> np.ndarray:
    """Apply a constant-folded pack recipe (constant-fold-pack pass):
    tl.pack / tl.vnni_pack parameters recorded on a tl.constant."""
    if "pack_inner_dims" in attrs:
        dims = tuple(attrs["pack_inner_dims"])
        tiles = tuple(attrs["pack_inner_tiles"])
        shape = arr.shape
        # split tiled dims
        split = []
        tile_axes = {}
        for i, d in enumerate(shape):
            if i in dims:
                t = tiles[dims.index(i)]
                tile_axes[i] = len(split) + 1
                split.extend([d // t, t])
            else:
                split.append(d)
        outer_positions = []
        pos = 0
        for i, d in enumerate(shape):
            outer_positions.append(pos)
            pos += 2 if i in dims else 1
        arr = arr.reshape(split)
        order = list(range(len(shape)))
        if "pack_outer_perm" in attrs:
            order = [order[p] for p in attrs["pack_outer_perm"]]
        perm = [outer_positions[i] for i in order] + \
               [tile_axes[i] for i in dims]
        arr = arr.transpose(perm)
        arr = arr.reshape([arr.shape[i] for i in range(len(perm))])
    if "pack_vnni" in attrs:
        vf = attrs["pack_vnni"]
        *lead, K, N = arr.shape
        arr = arr.reshape(*lead, K // vf, vf, N)
        arr = np.moveaxis(arr, -2, -1)  # [..., K/vf, N, vf]
    return np.ascontiguousarray(arr)
