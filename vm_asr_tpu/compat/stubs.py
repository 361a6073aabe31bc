"""sys.modules stubs that let the reference PyTorch model import on CPU.

The reference tree (model/vmamba.py, model/model.py, utils/, base/,
logger/) imports several packages that are irrelevant to a CPU forward
pass (triton, timm, fvcore, torchinfo, torchaudio, wandb, prettytable).
``install_stubs()`` inserts minimal working substitutes for whichever of
those are missing, so ``import model.model`` succeeds. Only modules that
fail to import are stubbed — real packages always win.

The timm DropPath / trunc_normal_ and torchaudio AmplitudeToDB /
DB_to_amplitude stubs are *functional* (the reference model uses them at
construction / forward time); the rest are inert placeholders.
"""

from __future__ import annotations

import importlib
import sys
import types


def _missing(name: str) -> bool:
    if name.split(".")[0] in sys.modules:
        return False
    try:
        importlib.import_module(name.split(".")[0])
        return False
    except Exception:
        return True


class _Anything:
    """Placeholder object tolerating calls, attribute access, subscripts."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        return _Anything()

    def __getitem__(self, item):
        return self


class _AnyModule(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _Anything()


def _register(mod: types.ModuleType) -> types.ModuleType:
    sys.modules[mod.__name__] = mod
    return mod


def _make_triton():
    triton = _register(_AnyModule("triton"))
    tl = _register(_AnyModule("triton.language"))
    triton.language = tl

    def jit(fn=None, **kwargs):
        if fn is None:
            return lambda f: f
        return fn

    triton.jit = jit
    triton.cdiv = lambda a, b: -(-a // b)
    tl.constexpr = object
    # torch._dynamo (pulled in lazily by torch.optim / clip_grad_norm_)
    # does `import triton.backends.compiler`; pre-register the submodules
    # so the fake top-level module passes as a package.
    for sub in ("triton.backends", "triton.backends.compiler",
                "triton.compiler", "triton.compiler.compiler",
                "triton.runtime", "triton.runtime.autotuner",
                "triton.runtime.jit"):
        mod = _register(_AnyModule(sub))
        parent, _, child = sub.rpartition(".")
        setattr(sys.modules[parent], child, mod)
    return triton


def _make_timm():
    import torch
    import torch.nn as nn

    timm = _register(types.ModuleType("timm"))
    models = _register(types.ModuleType("timm.models"))
    layers = _register(types.ModuleType("timm.models.layers"))
    sched = _register(types.ModuleType("timm.scheduler"))
    for name in ("cosine_lr", "step_lr", "scheduler"):
        _register(types.ModuleType(f"timm.scheduler.{name}"))
    timm.models, timm.scheduler, models.layers = models, sched, layers

    class DropPath(nn.Module):
        """timm stochastic depth: per-sample drop, rescale by keep prob."""

        def __init__(self, drop_prob: float = 0.0, scale_by_keep: bool = True):
            super().__init__()
            self.drop_prob = float(drop_prob)
            self.scale_by_keep = scale_by_keep

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            if keep > 0.0 and self.scale_by_keep:
                mask = mask / keep
            return x * mask

    layers.DropPath = DropPath
    layers.trunc_normal_ = torch.nn.init.trunc_normal_

    class Scheduler:
        def __init__(self, *a, **k):
            raise NotImplementedError("timm scheduler stub")

    sys.modules["timm.scheduler.scheduler"].Scheduler = Scheduler
    sys.modules["timm.scheduler.cosine_lr"].CosineLRScheduler = Scheduler
    sys.modules["timm.scheduler.step_lr"].StepLRScheduler = Scheduler
    return timm


def _make_torchaudio():
    import torch
    import torch.nn as nn

    ta = _register(_AnyModule("torchaudio"))
    transforms = _register(types.ModuleType("torchaudio.transforms"))
    functional = _register(types.ModuleType("torchaudio.functional"))
    ta.transforms, ta.functional = transforms, functional

    class AmplitudeToDB(nn.Module):
        # torchaudio semantics: power → 10·log10, amplitude → 20·log10,
        # optional per-call top_db floor at max − top_db.
        def __init__(self, stype: str = "power", top_db=None):
            super().__init__()
            self.multiplier = 10.0 if stype == "power" else 20.0
            self.top_db = top_db

        def forward(self, x):
            db = self.multiplier * torch.log10(torch.clamp(x, min=1e-10))
            if self.top_db is not None:
                db = torch.clamp(db, min=db.amax() - self.top_db)
            return db

    transforms.AmplitudeToDB = AmplitudeToDB

    def db_to_amplitude(x, ref: float = 1.0, power: float = 1.0):
        return ref * torch.pow(torch.pow(10.0, 0.1 * x), power)

    functional.DB_to_amplitude = db_to_amplitude
    return ta


def _make_fvcore():
    fvcore = _register(types.ModuleType("fvcore"))
    fnn = _register(types.ModuleType("fvcore.nn"))
    fvcore.nn = fnn
    fnn.FlopCountAnalysis = _Anything
    fnn.flop_count_str = lambda *a, **k: ""
    fnn.flop_count = lambda *a, **k: ({}, {})
    fnn.parameter_count = lambda m: {
        "": sum(p.numel() for p in m.parameters())
    }
    return fvcore


def _make_torchinfo():
    torchinfo = _register(types.ModuleType("torchinfo"))
    torchinfo.summary = lambda *a, **k: ""
    return torchinfo


def _make_prettytable():
    mod = _register(types.ModuleType("prettytable"))

    class PrettyTable:
        def __init__(self, *a, **k):
            self.field_names = []
            self._rows = []

        def add_row(self, row):
            self._rows.append(list(row))

        def __str__(self):
            return "\n".join(str(r) for r in [self.field_names] + self._rows)

    mod.PrettyTable = PrettyTable
    return mod


def install_stubs() -> None:
    """Install stand-ins for whichever reference dependencies are absent."""
    if _missing("triton"):
        _make_triton()
    if _missing("timm"):
        _make_timm()
    if _missing("torchaudio"):
        _make_torchaudio()
    if _missing("fvcore"):
        _make_fvcore()
    if _missing("torchinfo"):
        _make_torchinfo()
    if _missing("prettytable"):
        _make_prettytable()
    if _missing("wandb"):
        _register(_AnyModule("wandb"))
