"""Pass manager and pass registry.

Equivalent of the reference's TableGen pass registry + cached pass bundles
(reference include/TPP/Passes.td, include/TPP/PassUtils.h:19-40): passes are
registered by flag-style name, pipelines are named sequences, and the manager
supports staged IR printing (-print-mlir=early/mid/late equivalents,
reference DefaultPipeline.cpp:33-36).
"""

from __future__ import annotations

import sys
from typing import Callable, Iterable

from ..ir import Function, Module

_REGISTRY: dict[str, Callable[..., "Pass"]] = {}
_PIPELINES: dict[str, Callable[..., list[str]]] = {}


class Pass:
    """A module transform. Subclasses set `name` and implement run()."""

    name = "<abstract>"

    def __init__(self, **options):
        self.options = options

    def run(self, module: Module) -> bool:
        """Return True if the IR changed."""
        changed = False
        for f in module.funcs.values():
            changed |= bool(self.run_on_function(f, module))
        return changed

    def run_on_function(self, func: Function, module: Module) -> bool:
        raise NotImplementedError


def register(cls):
    """Class decorator: register a Pass subclass under its .name."""
    _REGISTRY[cls.name] = cls
    return cls


def register_pipeline(name: str):
    """Decorator for a function options -> list of pass names/instances."""
    def deco(fn):
        _PIPELINES[name] = fn
        return fn
    return deco


def make_pass(name: str, **options) -> Pass:
    if name not in _REGISTRY:
        raise KeyError(f"unknown pass '{name}' "
                       f"(available: {', '.join(sorted(_REGISTRY))})")
    return _REGISTRY[name](**options)


def available_passes() -> list[str]:
    return sorted(_REGISTRY)


def available_pipelines() -> list[str]:
    return sorted(_PIPELINES)


def expand_pipeline(name: str, **options) -> list[Pass]:
    if name in _PIPELINES:
        out = []
        for item in _PIPELINES[name](**options):
            if isinstance(item, Pass):
                out.append(item)
            else:
                out.extend(expand_pipeline(item))
        return out
    return [make_pass(name, **options)]


class PassManager:
    def __init__(self, passes: Iterable[Pass | str] = (),
                 print_after: bool = False, verify_each: bool = True,
                 print_stream=None):
        self.passes: list[Pass] = []
        for p in passes:
            if isinstance(p, str):
                self.passes.extend(expand_pipeline(p))
            else:
                self.passes.append(p)
        self.print_after = print_after
        self.verify_each = verify_each
        self.print_stream = print_stream or sys.stderr

    def add(self, p: Pass | str, **options):
        if isinstance(p, str):
            self.passes.extend(expand_pipeline(p, **options))
        else:
            self.passes.append(p)
        return self

    def run(self, module: Module) -> Module:
        for p in self.passes:
            p.run(module)
            if self.verify_each:
                try:
                    module.verify()
                except ValueError as e:
                    raise ValueError(f"verification failed after pass "
                                     f"'{p.name}': {e}") from e
            if self.print_after:
                print(f"// ----- IR after {p.name} -----",
                      file=self.print_stream)
                print(module, file=self.print_stream)
        return module


def run_pipeline(module: Module, *names: str, **kw) -> Module:
    return PassManager(names, **kw).run(module)
