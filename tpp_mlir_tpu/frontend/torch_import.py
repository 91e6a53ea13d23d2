"""PyTorch importer — the torch-dynamo ingestion equivalent.

The reference benchmarks torch-dynamo-exported MLP/GEMM models
(benchmarks/mlir/pytorch/*.mlir, config/pytorch/torch_dynamo.json): torch
traces to linalg IR, then the TPP pipeline compiles it. Here the importer
converts a torch.nn module directly into the tensor IR; weights become
literal constants (pre-packable by constant-fold-pack like any weight).

Supported module classes: Sequential / Linear / ReLU / GELU / Tanh /
Softmax / Flatten / Conv2d (incl. zero padding) / BatchNorm2d (eval
fold to scale+shift) / MaxPool2d / AvgPool2d / Identity / Dropout.
Everything runs through the same default pipeline as tpp-gen models.
"""

from __future__ import annotations

from ..ir import Function, Module, TensorType, TppBuilder


def _dtype_of(t) -> str:
    import torch

    return {torch.float32: "f32", torch.bfloat16: "bf16",
            torch.float16: "f16"}[t]


def import_torch(model, example_shape, dtype: str = "f32",
                 name: str = "entry") -> Module:
    """Convert a torch.nn module to a tensor-IR Module.

    example_shape: input tensor shape (batch included)."""
    import torch
    import torch.nn as nn

    model = model.eval()
    m = Module()
    f = m.add(Function(name, [TensorType(tuple(example_shape), dtype)],
                       ["x"]))
    b = TppBuilder(f)
    x = f.args[0]
    counter = [0]

    def literal(tensor, suffix):
        key = f"t{counter[0]}_{suffix}"
        counter[0] += 1
        m.literals[key] = tensor.detach().cpu().float().numpy()
        return key

    def const_of(tensor, shape):
        key = literal(tensor, "w")
        return b.create("tl.constant", [], [TensorType(shape, dtype)],
                        {"init": "literal", "literal": key}).result

    def emit(layer, x):
        if isinstance(layer, nn.Sequential):
            for sub in layer:
                x = emit(sub, x)
            return x
        if isinstance(layer, nn.Linear):
            K, N = layer.in_features, layer.out_features
            w = const_of(layer.weight.T.contiguous(), (K, N))
            acc = b.constant(TensorType((x.type.shape[0], N), dtype),
                             init="zero")
            x = b.matmul(x, w, acc)
            if layer.bias is not None:
                bias = const_of(layer.bias, (N,))
                x = b.add(x, bias)
            return x
        if isinstance(layer, nn.ReLU):
            return b.relu(x)
        if isinstance(layer, nn.GELU):
            return b.unary("tl.gelu", x)
        if isinstance(layer, nn.Tanh):
            return b.unary("tl.tanh", x)
        if isinstance(layer, nn.Softmax):
            return b.softmax(x, axis=layer.dim if layer.dim is not None
                             else -1)
        if isinstance(layer, nn.Flatten):
            n = 1
            for d in x.type.shape[1:]:
                n *= d
            return b.reshape(x, (x.type.shape[0], n))
        if isinstance(layer, nn.Conv2d):
            K = layer.out_channels
            w = const_of(layer.weight, tuple(layer.weight.shape))
            ph, pw = (layer.padding if isinstance(layer.padding, tuple)
                      else (layer.padding, layer.padding))
            if ph or pw:
                x = b.pad(x, (0, 0, ph, pw), (0, 0, ph, pw))
            N, C, H, W = x.type.shape
            R, S = layer.kernel_size
            sh, sw = layer.stride
            P = (H - R) // sh + 1
            Q = (W - S) // sw + 1
            acc = b.constant(TensorType((N, K, P, Q), dtype), init="zero")
            x = b.conv2d_nchw_fchw(x, w, acc, strides=(sh, sw))
            if layer.bias is not None:
                bias = const_of(layer.bias, (K,))
                bias3 = b.reshape(bias, (K, 1, 1))
                x = b.add(x, bias3)
            return x
        if isinstance(layer, nn.BatchNorm2d):
            # eval-mode fold: y = x * a + b, a = gamma/sqrt(var+eps),
            # b = beta - mean*a (per channel)
            import torch as _t

            with _t.no_grad():
                a = (layer.weight / _t.sqrt(layer.running_var + layer.eps))
                bb = layer.bias - layer.running_mean * a
            C = a.numel()
            av = const_of(a.reshape(C, 1, 1), (C, 1, 1))
            bv = const_of(bb.reshape(C, 1, 1), (C, 1, 1))
            return b.add(b.mul(x, av), bv)
        if isinstance(layer, (nn.MaxPool2d, nn.AvgPool2d)):
            ks = layer.kernel_size
            ks = ks if isinstance(ks, tuple) else (ks, ks)
            st = layer.stride or ks
            st = st if isinstance(st, tuple) else (st, st)
            opn = ("tl.max_pool2d" if isinstance(layer, nn.MaxPool2d)
                   else "tl.avg_pool2d")
            return b.pool2d(opn, x, ks, st)
        if isinstance(layer, (nn.Identity, nn.Dropout)):
            return x
        raise NotImplementedError(
            f"torch import: unsupported layer {type(layer).__name__}")

    out = emit(model, x)
    b.ret(out)
    m.verify()

    # FLOP accounting for the harness (BENCH_TOTAL_FLOPS role)
    flops = 0
    for op in f.ops:
        if op.opname == "tl.matmul":
            mm, kk = op.operands[0].type.shape
            nn_ = op.operands[1].type.shape[1]
            flops += 2 * mm * nn_ * kk
        elif op.opname == "tl.conv2d_nchw_fchw":
            i, w, o = (v.type.shape for v in op.operands)
            flops += 2 * o[0] * o[1] * o[2] * o[3] * w[1] * w[2] * w[3]
        elif op.opname in ("tl.add", "tl.relu"):
            flops += op.results[0].type.num_elements
    m.attrs["flops"] = flops
    return m


def import_torch_fx(model, example_shape, dtype: str = "f32",
                    name: str = "entry") -> Module:
    """Graph-level importer via torch.fx symbolic tracing: handles residual
    connections and functional calls (the closest analogue of the
    reference's torch-dynamo linalg export). Falls back on the module-level
    importer's layer lowering for call_module nodes."""
    import operator

    import torch
    import torch.fx as fx
    import torch.nn as nn
    import torch.nn.functional as F

    model = model.eval()
    graph_module = fx.symbolic_trace(model)
    modules = dict(graph_module.named_modules())

    m = Module()
    f = m.add(Function(name, [TensorType(tuple(example_shape), dtype)],
                       ["x"]))
    b = TppBuilder(f)
    counter = [0]

    def literal(tensor, suffix):
        key = f"fx{counter[0]}_{suffix}"
        counter[0] += 1
        m.literals[key] = tensor.detach().cpu().float().numpy()
        return key

    def const_of(tensor, shape):
        key = literal(tensor, "w")
        return b.create("tl.constant", [], [TensorType(tuple(shape), dtype)],
                        {"init": "literal", "literal": key}).result

    # reuse the module-level lowering by constructing a mini-importer bound
    # to this builder
    def lower_module(layer, x):
        from . import torch_import as _self

        # inline: reimplement via the same logic as import_torch's emit by
        # temporarily binding b/const_of. Keep in sync with import_torch.
        if isinstance(layer, nn.Linear):
            K, N = layer.in_features, layer.out_features
            w = const_of(layer.weight.T.contiguous(), (K, N))
            acc = b.constant(TensorType((x.type.shape[0], N), dtype),
                             init="zero")
            x = b.matmul(x, w, acc)
            if layer.bias is not None:
                x = b.add(x, const_of(layer.bias, (N,)))
            return x
        if isinstance(layer, nn.Conv2d):
            K = layer.out_channels
            w = const_of(layer.weight, tuple(layer.weight.shape))
            ph, pw = (layer.padding if isinstance(layer.padding, tuple)
                      else (layer.padding, layer.padding))
            if ph or pw:
                x = b.pad(x, (0, 0, ph, pw), (0, 0, ph, pw))
            N_, C, H, W = x.type.shape
            R, S = layer.kernel_size
            sh, sw = layer.stride
            P = (H - R) // sh + 1
            Q = (W - S) // sw + 1
            acc = b.constant(TensorType((N_, K, P, Q), dtype), init="zero")
            x = b.conv2d_nchw_fchw(x, w, acc, strides=(sh, sw))
            if layer.bias is not None:
                x = b.add(x, b.reshape(const_of(layer.bias, (K,)),
                                       (K, 1, 1)))
            return x
        if isinstance(layer, nn.BatchNorm2d):
            with torch.no_grad():
                a = layer.weight / torch.sqrt(layer.running_var + layer.eps)
                bb = layer.bias - layer.running_mean * a
            C = a.numel()
            return b.add(b.mul(x, const_of(a.reshape(C, 1, 1), (C, 1, 1))),
                         const_of(bb.reshape(C, 1, 1), (C, 1, 1)))
        if isinstance(layer, nn.ReLU):
            return b.relu(x)
        if isinstance(layer, nn.GELU):
            return b.unary("tl.gelu", x)
        if isinstance(layer, (nn.MaxPool2d, nn.AvgPool2d)):
            ks = layer.kernel_size
            ks = ks if isinstance(ks, tuple) else (ks, ks)
            st = layer.stride or ks
            st = st if isinstance(st, tuple) else (st, st)
            opn = ("tl.max_pool2d" if isinstance(layer, nn.MaxPool2d)
                   else "tl.avg_pool2d")
            return b.pool2d(opn, x, ks, st)
        if isinstance(layer, nn.Flatten):
            n = 1
            for d in x.type.shape[1:]:
                n *= d
            return b.reshape(x, (x.type.shape[0], n))
        if isinstance(layer, (nn.Identity, nn.Dropout)):
            return x
        raise NotImplementedError(
            f"fx import: unsupported module {type(layer).__name__}")

    env = {}
    for node in graph_module.graph.nodes:
        if node.op == "placeholder":
            env[node.name] = f.args[0]
        elif node.op == "call_module":
            env[node.name] = lower_module(modules[node.target],
                                          env[node.args[0].name])
        elif node.op == "call_function":
            if node.target in (operator.add, torch.add):
                env[node.name] = b.add(env[node.args[0].name],
                                       env[node.args[1].name])
            elif node.target in (torch.relu, F.relu):
                env[node.name] = b.relu(env[node.args[0].name])
            elif node.target is torch.flatten:
                x = env[node.args[0].name]
                n = 1
                for d in x.type.shape[1:]:
                    n *= d
                env[node.name] = b.reshape(x, (x.type.shape[0], n))
            else:
                raise NotImplementedError(
                    f"fx import: unsupported function {node.target}")
        elif node.op == "call_method":
            raise NotImplementedError(
                f"fx import: unsupported method {node.target}")
        elif node.op == "output":
            arg = node.args[0]
            b.ret(env[arg.name] if hasattr(arg, "name") else env[arg[0].name])
    m.verify()
    from ..utils.flops import count_flops

    m.attrs["flops"] = count_flops(m, name)
    return m
