"""Import the FULL reference `compressai` package (from /root/reference)
with its pybind11 C++ extensions built on the fly and absent third-party
optional deps (torch_geometric, pointops, ...) stubbed out.

This is the test-only bridge used to exchange model-level bitstreams with
the actual reference network (models/base.py:202-213) — the north-star
interop contract. Nothing in flashgmm_tpu imports this module.

APPROX_MODE / USE_SIMD are latched in C++ statics on first use
(rans_interface.cpp:99-130): set them in the environment before the first
coder call (use a subprocess per combination).
"""

import sys
import types


class _StubModule(types.ModuleType):
    """Package-like module whose every attribute is a permissive dummy."""

    __path__: list = []

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _Dummy


class _Dummy:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        raise AttributeError(name)


_STUBS = [
    "torch_geometric",
    "torch_geometric.transforms",
    "torch_geometric.data",
    "torch_geometric.data.datapipes",
    "torch_geometric.utils",
    "torch_geometric.nn",
    "torch_geometric.nn.pool",
    "pointops",
    "torchvision",
    "torchvision.transforms",
    "torchvision.transforms.functional",
    "pytorch_msssim",
]


def import_reference_compressai():
    """Returns the imported reference ``compressai`` package."""
    if "compressai" in sys.modules:
        return sys.modules["compressai"]
    repo_tools = __file__.rsplit("/", 1)[0]
    sys.path.insert(0, repo_tools.rsplit("/", 1)[0])
    from tools.record_reference_goldens import load_reference_modules

    ans, cxx = load_reference_modules()
    sys.modules["compressai.ans"] = ans
    sys.modules["compressai._CXX"] = cxx
    for name in _STUBS:
        if name not in sys.modules:
            sys.modules[name] = _StubModule(name)
    sys.path.insert(0, "/root/reference")
    import compressai  # noqa: F401

    return compressai
