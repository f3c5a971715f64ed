"""Import the reference's torch modules for golden parity tests.

The reference package cannot be imported as shipped (broken imports in its
__init__ files — SURVEY.md Appendix A #1/#2), so we assemble a shim package
whose __init__ exposes exactly the symbols the submodules expect.
Test-only: nothing from here ships in the framework.
"""

import importlib.util
import sys
import types

REF = "/root/reference/srcs"


def _load(pkg_name: str, dirname: str, mod_name: str):
    spec = importlib.util.spec_from_file_location(
        f"{pkg_name}.{mod_name}", f"{dirname}/{mod_name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{pkg_name}.{mod_name}"] = mod
    spec.loader.exec_module(mod)
    return mod


_cache = {}


def reference_modules():
    """Returns the shim package for srcs/modules (conv, lstm, seanet, unet)."""
    if "modules" in _cache:
        return _cache["modules"]
    pkg = types.ModuleType("refmod")
    pkg.__path__ = [f"{REF}/modules"]
    sys.modules["refmod"] = pkg
    norm = _load("refmod", f"{REF}/modules", "norm")
    conv = _load("refmod", f"{REF}/modules", "conv")
    lstm = _load("refmod", f"{REF}/modules", "lstm")
    for n in (
        "SConv1d",
        "SConvTranspose1d",
        "NormConv1d",
        "NormConv2d",
        "NormConvTranspose1d",
        "NormConvTranspose2d",
        "ConvLinear",
        "pad1d",
        "unpad1d",
    ):
        setattr(pkg, n, getattr(conv, n))
    pkg.SLSTM = lstm.SLSTM
    seanet = _load("refmod", f"{REF}/modules", "seanet")
    pkg.SEANetEncoder = seanet.SEANetEncoder
    pkg.SEANetDecoder = seanet.SEANetDecoder
    unet = _load("refmod", f"{REF}/modules", "unet")
    pkg.conv = conv
    pkg.lstm = lstm
    pkg.seanet = seanet
    pkg.unet = unet
    _cache["modules"] = pkg
    return pkg


def reference_quantization():
    """Shim for srcs/quantization (distrib, core_vq, vq)."""
    if "quant" in _cache:
        return _cache["quant"]
    pkg = types.ModuleType("refq")
    pkg.__path__ = [f"{REF}/quantization"]
    sys.modules["refq"] = pkg
    distrib = _load("refq", f"{REF}/quantization", "distrib")
    pkg.distrib = distrib
    core_vq = _load("refq", f"{REF}/quantization", "core_vq")
    pkg.core_vq = core_vq
    vq = _load("refq", f"{REF}/quantization", "vq")
    pkg.vq = vq
    _cache["quant"] = pkg
    return pkg
