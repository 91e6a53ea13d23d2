"""ViT family through the fx importer (models/vit.py): the new
shape-plumbing methods (flatten / transpose / permute / reshape) and
the conv-patch-embed + encoder program, differential against torch."""

import numpy as np
import pytest
import torch
import torch.nn as nn

from tpp_mlir_tpu.frontend import import_torch_fx
from tpp_mlir_tpu.models.vit import build_vit_block
from tpp_mlir_tpu.passes import run_pipeline
from tpp_mlir_tpu.runtime import compile as tpp_compile


def _run(m, x):
    fn = tpp_compile(m)
    out = fn(np.asarray(x, np.float32))
    return np.asarray(out[0] if isinstance(out, tuple) else out)


def _rel(got, want):
    return np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)


@pytest.mark.parametrize("method", ["reshape", "view", "transpose",
                                    "permute", "flatten"])
def test_shape_methods(method):
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Linear(24, 24)

        def forward(self, x):
            if method == "reshape":
                x = x.reshape(2, 6, 24)
            elif method == "view":
                x = x.view(2, -1, 24)
            elif method == "transpose":
                x = x.transpose(1, 2).transpose(1, 2)
            elif method == "permute":
                x = x.permute(0, 2, 1).permute(0, 2, 1)
            else:
                x = x.flatten(1).reshape(2, 6, 24)
            return self.fc(x)

    model = M().eval()
    x = np.random.default_rng(0).normal(size=(2, 6, 24)).astype(np.float32)
    m = import_torch_fx(model, (2, 6, 24))
    run_pipeline(m, "default-tpp-passes")
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    assert _rel(_run(m, x), want) < 2e-3


def test_vit_block_matches_torch():
    m, model = build_vit_block(batch=2, image=16, patch=4, embed=64,
                               heads=2, layers=1)
    run_pipeline(m, "default-tpp-passes")
    x = np.random.default_rng(1).normal(
        size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    got = _run(m, x)
    assert got.shape == want.shape == (2, 16, 64)
    assert _rel(got, want) < 2e-3


def test_vit_with_classifier_head():
    m, model = build_vit_block(batch=2, image=16, patch=4, embed=64,
                               heads=2, layers=2, classes=10)
    run_pipeline(m, "default-tpp-passes")
    x = np.random.default_rng(2).normal(
        size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    got = _run(m, x)
    assert got.shape == (2, 10)
    assert _rel(got, want) < 2e-3
