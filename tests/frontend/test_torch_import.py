"""Torch importer tests: numerics vs torch eager, through the full pipeline
(the torch-dynamo benchmark ingestion path, reference
benchmarks/mlir/pytorch/*.mlir)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tpp_mlir_tpu.frontend import import_torch  # noqa: E402
from tpp_mlir_tpu.passes import run_pipeline  # noqa: E402
from tpp_mlir_tpu.runtime import compile as tpp_compile  # noqa: E402


def test_torch_mlp_roundtrip():
    torch.manual_seed(0)
    model = torch.nn.Sequential(
        torch.nn.Linear(64, 128), torch.nn.ReLU(),
        torch.nn.Linear(128, 64), torch.nn.ReLU(),
        torch.nn.Linear(64, 32),
    )
    x = torch.randn(16, 64)
    with torch.no_grad():
        want = model(x).numpy()

    m = import_torch(model, (16, 64))
    assert m.attrs["flops"] > 0
    run_pipeline(m, "default-tpp-passes")
    got = tpp_compile(m, jit=False)(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=1e-4, rtol=1e-3)


def test_torch_conv_block():
    torch.manual_seed(1)
    model = torch.nn.Sequential(
        torch.nn.Conv2d(128, 128, 3, stride=1, padding=0),
        torch.nn.ReLU(),
    )
    x = torch.randn(2, 128, 10, 10)
    with torch.no_grad():
        want = model(x).numpy()

    m = import_torch(model, (2, 128, 10, 10))
    run_pipeline(m, "default-tpp-passes")
    assert 'layout = "conv_nhwc"' in str(m)  # NCHW imports ride the NHWC-native kernel
    got = tpp_compile(m, jit=False)(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=1e-3, rtol=1e-3)


def test_torch_mlp_softmax_flatten():
    torch.manual_seed(2)
    model = torch.nn.Sequential(
        torch.nn.Flatten(),
        torch.nn.Linear(64, 32), torch.nn.GELU(),
        torch.nn.Linear(32, 10), torch.nn.Softmax(dim=1),
    )
    x = torch.randn(4, 8, 8)
    with torch.no_grad():
        want = model(x).numpy()
    m = import_torch(model, (4, 8, 8))
    run_pipeline(m, "default-tpp-passes")
    got = tpp_compile(m, jit=False)(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=1e-4, rtol=1e-3)


def test_torch_conv_with_padding():
    torch.manual_seed(3)
    model = torch.nn.Sequential(
        torch.nn.Conv2d(128, 128, 3, stride=1, padding=1),
        torch.nn.ReLU(),
    )
    x = torch.randn(2, 128, 8, 8)
    with torch.no_grad():
        want = model(x).numpy()
    m = import_torch(model, (2, 128, 8, 8))
    run_pipeline(m, "default-tpp-passes")
    assert 'layout = "conv_nhwc"' in str(m)  # NCHW imports ride the NHWC-native kernel
    got = tpp_compile(m, jit=False)(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=1e-3, rtol=1e-3)


def test_torch_conv_bn_pool_stack():
    torch.manual_seed(4)
    model = torch.nn.Sequential(
        torch.nn.Conv2d(128, 128, 3, padding=1),
        torch.nn.BatchNorm2d(128),
        torch.nn.ReLU(),
        torch.nn.MaxPool2d(2),
        torch.nn.AvgPool2d(2),
        torch.nn.Flatten(),
        torch.nn.Linear(128 * 2 * 2, 10),
    )
    model.eval()
    # give batchnorm non-trivial stats
    with torch.no_grad():
        model[1].running_mean.uniform_(-0.5, 0.5)
        model[1].running_var.uniform_(0.5, 1.5)
    x = torch.randn(2, 128, 8, 8)
    with torch.no_grad():
        want = model(x).numpy()
    m = import_torch(model, (2, 128, 8, 8))
    run_pipeline(m, "default-tpp-passes")
    got = tpp_compile(m, jit=False)(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=2e-3, rtol=2e-3)


def test_torch_fx_residual_block():
    """Graph-level import (torch.fx): a ResNet-style residual block."""
    from tpp_mlir_tpu.frontend import import_torch_fx

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = torch.nn.Conv2d(128, 128, 3, padding=1)
            self.bn1 = torch.nn.BatchNorm2d(128)
            self.c2 = torch.nn.Conv2d(128, 128, 3, padding=1)
            self.bn2 = torch.nn.BatchNorm2d(128)

        def forward(self, x):
            y = torch.relu(self.bn1(self.c1(x)))
            y = self.bn2(self.c2(y))
            return torch.relu(y + x)

    torch.manual_seed(5)
    model = Block().eval()
    with torch.no_grad():
        model.bn1.running_mean.uniform_(-0.2, 0.2)
        model.bn2.running_var.uniform_(0.8, 1.2)
    x = torch.randn(2, 128, 8, 8)
    with torch.no_grad():
        want = model(x).numpy()
    m = import_torch_fx(model, (2, 128, 8, 8))
    assert m.attrs["flops"] > 0
    run_pipeline(m, "default-tpp-passes")
    assert 'layout = "conv_nhwc"' in str(m)  # NCHW imports ride the NHWC-native kernel
    got = tpp_compile(m, jit=False)(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=2e-3, rtol=2e-3)


def test_torch_transformer_encoder_block():
    """A torch transformer encoder block (pre-LN: LayerNorm ->
    MultiheadAttention -> residual -> LayerNorm -> FFN -> residual)
    imports via torch.fx, lowers with ONE fused attention core, and
    matches torch numerics."""
    import torch
    import torch.nn as nn

    from tpp_mlir_tpu.frontend import import_torch_fx

    E, H, B, S = 64, 4, 2, 16

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln1 = nn.LayerNorm(E)
            self.attn = nn.MultiheadAttention(E, H, batch_first=True)
            self.ln2 = nn.LayerNorm(E)
            self.fc1 = nn.Linear(E, 4 * E)
            self.act = nn.GELU()
            self.fc2 = nn.Linear(4 * E, E)

        def forward(self, x):
            h = self.ln1(x)
            a, _ = self.attn(h, h, h, need_weights=False)
            x = x + a
            h = self.ln2(x)
            return x + self.fc2(self.act(self.fc1(h)))

    torch.manual_seed(0)
    model = Block().eval()
    xt = torch.randn(B, S, E)
    with torch.no_grad():
        want = model(xt).numpy()

    m = import_torch_fx(model, (B, S, E))
    run_pipeline(m, "default-tpp-passes")
    s = str(m)
    assert "xsmm.attention" in s and "tl.softmax" not in s
    fn = tpp_compile(m, jit=False)
    out = fn(jnp.asarray(xt.numpy()))
    got = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_torch_transformer_bf16_import():
    """bf16 transformer block imports and executes (literal weights cast at
    init; flash/GEMM kernels take bf16 natively)."""
    from tpp_mlir_tpu.models.transformer_block import build_transformer_block
    from tpp_mlir_tpu.runtime import tensor_init

    m = build_transformer_block(batch=1, seq=32, embed=64, heads=4,
                                dtype="bf16")
    run_pipeline(m, "default-tpp-passes")
    s = str(m)
    # LayerNorms fuse into their consumer GEMMs as prologues (r3)
    assert "xsmm.attention" in s and 'prologue = "layer_norm"' in s
    x = jnp.asarray(tensor_init("rand", (1, 32, 64), "bf16", seed=1))
    fn = tpp_compile(m, jit=False)
    out = fn(x)
    out = out[0] if isinstance(out, tuple) else out
    assert str(out.dtype) == "bfloat16"
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_torch_resnet_downsample_block():
    """Stride-2 downsampling residual block with a 1x1 projection shortcut
    (the torchvision ResNet stage-transition pattern): strided convs ride
    the XLA conv path (reference also limits conv->BRGEMM to stride 1,
    docs/ConvMapping.md), BN folds, and the projection shortcut joins the
    residual add — exact vs torch eager."""
    import torch

    from tpp_mlir_tpu.frontend import import_torch_fx

    class Down(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = torch.nn.Conv2d(32, 64, 3, stride=2, padding=1)
            self.bn1 = torch.nn.BatchNorm2d(64)
            self.c2 = torch.nn.Conv2d(64, 64, 3, padding=1)
            self.bn2 = torch.nn.BatchNorm2d(64)
            self.sc = torch.nn.Conv2d(32, 64, 1, stride=2)
            self.bns = torch.nn.BatchNorm2d(64)

        def forward(self, x):
            y = torch.relu(self.bn1(self.c1(x)))
            y = self.bn2(self.c2(y))
            return torch.relu(y + self.bns(self.sc(x)))

    torch.manual_seed(0)
    m = Down().eval()
    mod = import_torch_fx(m, (2, 32, 16, 16))
    run_pipeline(mod, "default-tpp-passes")
    fn = tpp_compile(mod, jit=True)
    x = np.random.RandomState(0).randn(2, 32, 16, 16).astype(np.float32)
    got = np.asarray(fn(jnp.asarray(x)))
    want = m(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("norm_first", [False, True])
def test_stock_transformer_encoder_layer(norm_first):
    """torch.nn.TransformerEncoderLayer — the STOCK module, both post-LN
    (torch default) and pre-LN. Its forward is not fx-traceable (mask
    dtype checks on proxies), so the importer decomposes it module-level
    into the LN/MHA/Linear handlers. Exact vs torch eager."""
    torch.manual_seed(0)
    m = torch.nn.TransformerEncoderLayer(
        d_model=64, nhead=4, dim_feedforward=256, batch_first=True,
        norm_first=norm_first, activation="gelu").eval()
    x = torch.randn(2, 16, 64)
    with torch.no_grad():
        want = m(x).numpy()
    mod = import_torch(m, (2, 16, 64))
    run_pipeline(mod, "default-tpp-passes")
    got = np.asarray(tpp_compile(mod, jit=True)(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_stock_transformer_encoder_stack():
    """torch.nn.TransformerEncoder: N stacked stock layers + final norm."""
    torch.manual_seed(1)
    enc = torch.nn.TransformerEncoder(
        torch.nn.TransformerEncoderLayer(64, 4, 256, batch_first=True,
                                         norm_first=True),
        num_layers=2, norm=torch.nn.LayerNorm(64)).eval()
    x = torch.randn(2, 16, 64)
    with torch.no_grad():
        want = enc(x).numpy()
    mod = import_torch(enc, (2, 16, 64))
    run_pipeline(mod, "default-tpp-passes")
    got = np.asarray(tpp_compile(mod, jit=True)(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_decoder_block_causal_import():
    """causal=True (torch is_causal kwarg) survives fx import, the fusion
    pipeline, and execution: the lowered decoder block matches the eager
    reference built from the same module semantics."""
    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.models.transformer_block import build_transformer_block
    from tpp_mlir_tpu.passes import run_pipeline
    from tpp_mlir_tpu.runtime import compile as tpp_compile
    from tpp_mlir_tpu.runtime import tensor_init

    ref = build_transformer_block(batch=2, seq=128, embed=256, heads=4,
                                  causal=True)
    low = build_transformer_block(batch=2, seq=128, embed=256, heads=4,
                                  causal=True)
    s = str(ref)
    assert "causal = true" in s
    run_pipeline(low, "default-tpp-passes")
    assert "causal = true" in str(low)
    x = jnp.asarray(tensor_init("rand", (2, 128, 256), "f32", seed=0))
    r = tpp_compile(ref, jit=True)(x)
    l = tpp_compile(low, jit=True)(x)
    np.testing.assert_allclose(np.asarray(l, np.float32),
                               np.asarray(r, np.float32),
                               atol=1e-4, rtol=1e-4)


def test_embedding_gather_import():
    """nn.Embedding lowers to tl.gather; a get_attr positional table adds
    in broadcast; numerics match torch exactly (pure lookup + GEMM)."""
    from tpp_mlir_tpu.frontend import import_torch_fx

    class Emb(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.wte = torch.nn.Embedding(96, 64)
            self.wpe = torch.nn.Parameter(torch.randn(16, 64) * 0.02)
            self.lm = torch.nn.Linear(64, 96, bias=False)

        def forward(self, ids):
            return self.lm(self.wte(ids) + self.wpe)

    torch.manual_seed(3)
    tm = Emb().eval()
    ids = np.random.default_rng(0).integers(0, 96, (2, 16)).astype(np.int32)
    with torch.no_grad():
        want = tm(torch.from_numpy(ids).long()).numpy()
    m = import_torch_fx(tm, (2, 16), dtype="f32", input_dtype="i32")
    assert "tl.gather" in str(m)
    run_pipeline(m, "default-tpp-passes")
    got = np.asarray(tpp_compile(m, jit=True)(jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_torch_is_causal_hint_needs_mask():
    """torch silently runs NON-causal when is_causal=True is passed without
    attn_mask (hint semantics) — the guard test for why the model builders
    pass the explicit mask. If a torch upgrade changes this, the builders
    can drop the masks."""
    torch.manual_seed(0)
    attn = torch.nn.MultiheadAttention(64, 4, batch_first=True).eval()
    x = torch.randn(2, 16, 64)
    with torch.no_grad():
        hinted, _ = attn(x, x, x, need_weights=False, is_causal=True)
        plain, _ = attn(x, x, x, need_weights=False)
    assert torch.allclose(hinted, plain)


def test_gpt_model_family():
    """The full GPT LM (wte + wpe + pre-LN causal blocks + ln_f + lm_head)
    imports, lowers through the default pipeline, and matches torch eager
    — embedding gather, causal attention (explicit torch-side mask), and
    the LM-head GEMM in one program."""
    from tpp_mlir_tpu.models.gpt import GptTorch
    from tpp_mlir_tpu.frontend import import_torch_fx

    torch.manual_seed(0)
    tm = GptTorch(96, 64, 4, 2, 4, max_seq=16).eval()
    ids = np.random.default_rng(0).integers(0, 96, (2, 16)).astype(np.int32)
    with torch.no_grad():
        want = tm(torch.from_numpy(ids).long()).numpy()
    m = import_torch_fx(tm, (2, 16), dtype="f32", input_dtype="i32")
    s = str(m)
    assert "tl.gather" in s and "causal = true" in s
    # the explicit torch-side causal mask must NOT materialize as a literal
    assert all(l.shape != (16, 16) for l in m.literals.values())
    run_pipeline(m, "default-tpp-passes")
    got = np.asarray(tpp_compile(m, jit=True)(jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_gpt_driver_row_builds():
    """The bench-driver 'gpt' model entry builds and int token-id args are
    generated in the gather table's id range."""
    from tpp_mlir_tpu.tools.bench_driver import build_module
    from tpp_mlir_tpu.tools.tpp_run import init_args

    m = build_module({"model": 'gpt:{"batch": 2, "seq": 16, "vocab": 96, '
                               '"embed": 64, "heads": 4, "layers": 1}'})
    args = init_args(m, "entry", "normal", 0)
    ids = np.asarray(args[0])
    assert ids.dtype == np.int32
    assert ids.min() >= 0 and ids.max() < 96


def test_pool_with_padding_refused():
    """The tl pool cannot express padding/dilation/ceil_mode: importing
    them silently (a 3x3/s2/p1 ResNet stem pool!) diverged from torch."""
    import torch.nn as nn

    from tpp_mlir_tpu.frontend.torch_import import import_torch

    with pytest.raises(NotImplementedError, match="padding"):
        import_torch(nn.MaxPool2d(3, stride=2, padding=1), (2, 8, 8, 8))
    with pytest.raises(NotImplementedError, match="ceil_mode"):
        import_torch(nn.AvgPool2d(2, ceil_mode=True), (2, 8, 8, 8))


def test_fx_attn_mask_without_is_causal_refused():
    """attn_mask passed WITHOUT is_causal=True must not silently import
    as bidirectional attention."""
    import torch
    import torch.nn as nn

    from tpp_mlir_tpu.frontend.torch_import import import_torch_fx

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.attn = nn.MultiheadAttention(32, 4, batch_first=True)
            self.register_buffer(
                "mask", torch.triu(torch.ones(8, 8, dtype=torch.bool), 1))

        def forward(self, x):
            return self.attn(x, x, x, attn_mask=self.mask,
                             need_weights=False)[0]

    with pytest.raises(NotImplementedError, match="attn_mask"):
        import_torch_fx(M(), (2, 8, 32))


def test_fx_multiple_inputs_refused():
    """Two placeholders would silently alias the single entry arg."""
    import torch.nn as nn

    from tpp_mlir_tpu.frontend.torch_import import import_torch_fx

    class M(nn.Module):
        def forward(self, x, y):
            return x + y

    with pytest.raises(NotImplementedError, match="multiple model inputs"):
        import_torch_fx(M(), (4, 8))


def test_fx_scalar_add_refused():
    import torch.nn as nn

    from tpp_mlir_tpu.frontend.torch_import import import_torch_fx

    class M(nn.Module):
        def forward(self, x):
            return x + 1.0

    with pytest.raises(NotImplementedError, match="scalar"):
        import_torch_fx(M(), (4, 8))


def test_fx_flatten_start_dim():
    import torch
    import torch.nn as nn

    from tpp_mlir_tpu.frontend.torch_import import import_torch_fx
    from tpp_mlir_tpu.runtime import interpret

    class M(nn.Module):
        def forward(self, x):
            return torch.flatten(x, 2)

    m = import_torch_fx(M(), (2, 3, 4, 5))
    out = interpret(m, "entry", np.zeros((2, 3, 4, 5), np.float32))
    got = out[0] if isinstance(out, tuple) else out
    assert got.shape == (2, 3, 20)
