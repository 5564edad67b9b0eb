"""Load the reference PyTorch FlowDec implementation (/root/reference) on CPU.

The reference's import graph pulls in packages that are absent from this
environment (pytorch_lightning, torchdyn, torchcfm, torchaudio, omegaconf,
hydra, wandb, librosa, onnxruntime, pesq/pystoi/speechmos/torch_pesq) and
JIT-compiles CUDA extensions at import time (op/upfirdn2d.py:34,
op/fused_act.py:35). None of that is needed to *run* the model on CPU:

  * `torch.utils.cpp_extension.load` is stubbed out before the op modules
    import; the pure-torch CPU fallbacks (op/upfirdn2d.py:170-180,
    op/fused_act.py:111-118) take over because all tensors live on CPU.
  * The missing packages are replaced by minimal stubs. Only three carry real
    behavior, each pinned to the documented semantics of the real package:
      - pytorch_lightning.LightningModule → torch.nn.Module subclass with
        no-op save_hyperparameters/log and a .device property;
      - torchdyn.core.NeuralODE → fixed-grid ODE integrator implementing the
        torchdyn fixed-step semantics over t_span (euler / explicit midpoint,
        plus objects exposing torchdyn's DiffEqSolver.step API, which runs the
        reference's own Heun2 solvers, sampling/solvers.py:15-61);
      - omegaconf.OmegaConf.create → identity (the reference only uses it to
        (un)marshal the config dict).
    Everything else is attribute-access stubs that fail loudly if called.
  * The `flowdec` package itself is registered WITHOUT executing its
    __init__.py (which imports every submodule and would drag in the whole
    dependency surface); submodules like flowdec.model import normally via
    the package __path__ and only pull what they need.

This gives the genuine reference nn.Modules — NCSNpp, feature extractors,
FlowModel pre/post-processing and enhance() — executing their real code paths
on CPU, to serve as the ground truth for tests/test_reference_parity.py.
"""

from __future__ import annotations

import sys
import types

import torch

REFERENCE_ROOT = "/root/reference"

_installed = False


def _stub_module(name: str) -> types.ModuleType:
    """A module whose attributes materialize as inert placeholder classes.

    The classes accept any constructor args (so `Foo(...)` at import/ctor
    time won't crash) but raise on any method call, keeping the stubs honest:
    no reference behavior is silently replaced.
    """

    class _Stub(types.ModuleType):
        def __getattr__(self, attr):  # noqa: D105
            if attr.startswith("__") and attr.endswith("__"):
                raise AttributeError(attr)

            def _refuse(self_, *a, **k):
                raise NotImplementedError(
                    f"stubbed {name}.{attr} must not be called in parity tests"
                )

            cls = type(attr, (), {"__init__": lambda self_, *a, **k: None,
                                  "__call__": _refuse,
                                  "__getattr__": lambda self_, a: _refuse})
            setattr(self, attr, cls)
            return cls

    mod = _Stub(name)
    sys.modules[name] = mod
    return mod


def _make_pytorch_lightning() -> types.ModuleType:
    pl = types.ModuleType("pytorch_lightning")

    class LightningModule(torch.nn.Module):
        def __init__(self):
            super().__init__()

        def save_hyperparameters(self, *args, **kwargs):
            self._saved_hyperparameters = args

        def log(self, *args, **kwargs):
            pass

        @property
        def device(self):
            try:
                return next(self.parameters()).device
            except StopIteration:
                return torch.device("cpu")

    class LightningDataModule:
        def __init__(self, *args, **kwargs):
            pass

    class Callback:
        pass

    class ModelCheckpoint(Callback):
        def __init__(self, *args, **kwargs):
            pass

    pl.LightningModule = LightningModule
    pl.LightningDataModule = LightningDataModule
    pl.Callback = Callback

    callbacks = types.ModuleType("pytorch_lightning.callbacks")
    callbacks.Callback = Callback
    callbacks.ModelCheckpoint = ModelCheckpoint
    pl.callbacks = callbacks

    utilities = types.ModuleType("pytorch_lightning.utilities")
    utilities.rank_zero_warn = lambda *a, **k: None
    exceptions = types.ModuleType("pytorch_lightning.utilities.exceptions")

    class MisconfigurationException(Exception):
        pass

    exceptions.MisconfigurationException = MisconfigurationException
    types_mod = types.ModuleType("pytorch_lightning.utilities.types")
    types_mod.STEP_OUTPUT = object
    utilities.exceptions = exceptions
    utilities.types = types_mod
    pl.utilities = utilities

    plugins = types.ModuleType("pytorch_lightning.plugins")
    environments = types.ModuleType("pytorch_lightning.plugins.environments")

    class SLURMEnvironment:
        def __init__(self, *a, **k):
            pass

        @staticmethod
        def detect():
            return False

    environments.SLURMEnvironment = SLURMEnvironment
    plugins.environments = environments
    pl.plugins = plugins

    for full, mod in [
        ("pytorch_lightning", pl),
        ("pytorch_lightning.callbacks", callbacks),
        ("pytorch_lightning.utilities", utilities),
        ("pytorch_lightning.utilities.exceptions", exceptions),
        ("pytorch_lightning.utilities.types", types_mod),
        ("pytorch_lightning.plugins", plugins),
        ("pytorch_lightning.plugins.environments", environments),
    ]:
        sys.modules[full] = mod
    return pl


def _make_torchdyn() -> types.ModuleType:
    """torchdyn stand-in: NeuralODE with torchdyn's fixed-step semantics.

    The reference calls NeuralODE(node_fn, solver=...).trajectory(x, t_span)
    (model.py:511-514). torchdyn fixed-step solvers integrate across the
    consecutive t_span points; 'euler' and 'midpoint' are the torchdyn
    built-ins the reference selects by string (sampling/solvers.py:64-68),
    and its custom Heun2 solvers subclass DiffEqSolver with a
    .step(f, x, t, dt) API — objects with .step are driven through that API
    so the reference's own solver code executes.
    """
    torchdyn = types.ModuleType("torchdyn")
    core = types.ModuleType("torchdyn.core")

    class NeuralODE:
        def __init__(self, vector_field, solver="euler", sensitivity="adjoint",
                     **kwargs):
            self.vector_field = vector_field
            self.solver = solver

        def trajectory(self, x, t_span):
            f = self.vector_field
            xs = [x]
            for i in range(len(t_span) - 1):
                t, dt = t_span[i], t_span[i + 1] - t_span[i]
                if hasattr(self.solver, "step"):
                    _, x, _ = self.solver.step(f, x, t, dt)
                elif self.solver == "euler":
                    x = x + dt * f(t, x)
                elif self.solver == "midpoint":
                    k1 = f(t, x)
                    x = x + dt * f(t + dt / 2, x + (dt / 2) * k1)
                else:
                    raise NotImplementedError(f"solver {self.solver!r}")
                xs.append(x)
            return torch.stack(xs)

    core.NeuralODE = NeuralODE
    torchdyn.core = core

    numerics = types.ModuleType("torchdyn.numerics")
    solvers = types.ModuleType("torchdyn.numerics.solvers")
    templates = types.ModuleType("torchdyn.numerics.solvers.templates")

    class DiffEqSolver:
        def __init__(self, order):
            self.order = order

    templates.DiffEqSolver = DiffEqSolver
    solvers.templates = templates
    numerics.solvers = solvers
    torchdyn.numerics = numerics

    for full, mod in [
        ("torchdyn", torchdyn),
        ("torchdyn.core", core),
        ("torchdyn.numerics", numerics),
        ("torchdyn.numerics.solvers", solvers),
        ("torchdyn.numerics.solvers.templates", templates),
    ]:
        sys.modules[full] = mod
    return torchdyn


def _make_omegaconf() -> types.ModuleType:
    omegaconf = types.ModuleType("omegaconf")

    class OmegaConf:
        @staticmethod
        def create(obj=None):
            return obj

        @staticmethod
        def to_container(obj, **kwargs):
            return obj

    omegaconf.OmegaConf = OmegaConf
    omegaconf.DictConfig = dict
    omegaconf.ListConfig = list
    sys.modules["omegaconf"] = omegaconf
    return omegaconf


def install_reference():
    """Install stubs and register the reference `flowdec` package.

    Returns the `flowdec` package module; import submodules as usual
    afterwards (e.g. `import flowdec.model`).
    """
    global _installed
    if _installed:
        return sys.modules["flowdec"]

    if "flowdec" in sys.modules:
        raise RuntimeError("a module named 'flowdec' is already imported")

    # 1. Never JIT-compile the CUDA extensions: the op modules call
    #    torch.utils.cpp_extension.load at import (op/upfirdn2d.py:34); on
    #    CPU the compiled ops are never invoked (device dispatch at
    #    op/upfirdn2d.py:170, op/fused_act.py:111).
    import torch.utils.cpp_extension as cppext

    cppext.load = lambda name, sources, **kw: None

    # 2. Dependency stubs.
    _make_pytorch_lightning()
    _make_torchdyn()
    _make_omegaconf()

    torchaudio = _stub_module("torchaudio")
    torchaudio_tf = _stub_module("torchaudio.transforms")
    torchaudio_fn = _stub_module("torchaudio.functional")
    torchaudio.transforms = torchaudio_tf
    torchaudio.functional = torchaudio_fn

    hydra = _stub_module("hydra")
    hydra_utils = _stub_module("hydra.utils")
    hydra.utils = hydra_utils

    for name in ("wandb", "librosa", "onnxruntime", "pystoi", "pesq",
                 "speechmos", "torch_pesq", "torchcfm"):
        _stub_module(name)
    pysepm = _stub_module("pysepm")
    pysepm.qualityMeasures = _stub_module("pysepm.qualityMeasures")

    # 3. Register `flowdec` with the reference's path but WITHOUT executing
    #    flowdec/__init__.py (which imports the full dependency surface).
    pkg = types.ModuleType("flowdec")
    pkg.__path__ = [f"{REFERENCE_ROOT}/flowdec"]
    pkg.__package__ = "flowdec"
    sys.modules["flowdec"] = pkg

    _installed = True
    return pkg


def load_backbone_config(name: str) -> dict:
    """Parse a reference backbone YAML into NCSNpp constructor kwargs."""
    import yaml

    path = f"{REFERENCE_ROOT}/config/model/backbone/{name}.yaml"
    with open(path) as f:
        cfg = yaml.safe_load(f)
    cfg = dict(cfg)
    cfg.pop("_target_", None)
    return cfg


def torch_complex_to_cpair(x: torch.Tensor):
    """torch complex [..., F, T] → numpy cpair [..., F, T, 2]."""
    import numpy as np

    return np.stack(
        [x.real.detach().cpu().numpy(), x.imag.detach().cpu().numpy()], axis=-1
    )


def cpair_to_torch_complex(x) -> torch.Tensor:
    """numpy/jax cpair [..., F, T, 2] → torch complex [..., F, T]."""
    import numpy as np

    arr = np.asarray(x)
    return torch.complex(torch.from_numpy(arr[..., 0].copy()),
                         torch.from_numpy(arr[..., 1].copy()))
