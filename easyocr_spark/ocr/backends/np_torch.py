"""Numpy reference executor for the torch graph definitions.

torch is absent from this image, so the CRAFT/CRNN/ResNet modules in
torch_craft.py / torch_crnn.py / torch_resnet.py could previously only
be MANIFEST-verified (key/shape bijections), never executed. This
module implements the exact ``torch`` / ``torch.nn`` /
``torch.nn.functional`` API subset those builders use — eval-mode
forward semantics over numpy float64 — so the REAL ``build_model()``
code and the real ``forward()`` methods run in-sandbox:

    with np_torch.installed():
        model = torch_craft.build_model()   # the actual builder code
        y = model(np_torch.from_numpy(x))   # the actual forward code

``installed()`` injects this module into ``sys.modules`` as ``torch``
(and the ``nn`` / ``functional`` submodules) ONLY when real torch is
absent, and always restores ``sys.modules`` on exit. Parameter init is
a seeded LCG (``seed()``), so layer-by-layer activations are
reproducible and tests can pin output shapes + checksums.

This is a verification tool, not a performance path: convolution is a
handful of einsums per kernel tap, LSTM is a plain per-timestep loop.
Layer semantics mirror torch eval mode: zero-padded conv with
stride/dilation, -inf-padded max pool, BN with running stats
(mean 0 / var 1 at init), bilinear interpolate with
align_corners=False, torch gate order (i, f, g, o) in the LSTM.

Module/state_dict bookkeeping matches torch's dotted naming
(Sequential/ModuleList children by index, buffers included), so
``model.state_dict()`` shapes can be asserted against each backend's
``expected_params()`` — executing the builder validates the manifest
machinery and vice versa.
"""

from __future__ import annotations

import contextlib
import sys
import types

import numpy as np

_RNG = np.random.default_rng(0)


def seed(s: int = 0) -> None:
    """Reset the parameter-init RNG (call before build_model for
    reproducible weights/checksums)."""
    global _RNG
    _RNG = np.random.default_rng(s)


class Tensor(np.ndarray):
    """ndarray + the tensor methods the forwards call."""

    def permute(self, *dims):
        return np.transpose(self, dims).view(Tensor)

    def numpy(self):
        return np.asarray(self)


def _t(a) -> Tensor:
    return np.ascontiguousarray(a).view(Tensor)


def from_numpy(a: np.ndarray) -> Tensor:
    return _t(np.asarray(a, dtype=np.float64))


def zeros(*shape) -> Tensor:
    return _t(np.zeros(shape))


def cat(tensors, dim: int = 0) -> Tensor:
    return _t(np.concatenate([np.asarray(t) for t in tensors], axis=dim))


def softmax(x, dim: int) -> Tensor:
    x = np.asarray(x, dtype=np.float64)
    m = x.max(axis=dim, keepdims=True)
    e = np.exp(x - m)
    return _t(e / e.sum(axis=dim, keepdims=True))


@contextlib.contextmanager
def no_grad():
    yield


def load(path, map_location=None):
    """Synthetic-checkpoint loader: a pickled dict of numpy arrays
    stands in for a .pth state_dict (tests generate them from the
    recorded checkpoint manifests)."""
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)


def save(obj, path) -> None:
    import pickle

    with open(path, "wb") as f:
        pickle.dump(obj, f)


class Parameter(np.ndarray):
    pass


def _param(*shape) -> Parameter:
    return _RNG.uniform(-0.1, 0.1, size=shape).view(Parameter)


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class Module:
    def __init__(self):
        object.__setattr__(self, "_modules", {})
        object.__setattr__(self, "_params", {})
        object.__setattr__(self, "_buffers", {})

    def __setattr__(self, name, value):
        if isinstance(value, Module):
            self._modules[name] = value
        elif isinstance(value, Parameter):
            self._params[name] = value
        object.__setattr__(self, name, value)

    def register_buffer(self, name, value):
        self._buffers[name] = value
        object.__setattr__(self, name, value)

    def __call__(self, *args):
        return self.forward(*args)

    def eval(self):
        return self

    def state_dict(self, prefix: str = "") -> dict:
        out = {}
        for n, p in self._params.items():
            out[prefix + n] = p
        for n, b in self._buffers.items():
            out[prefix + n] = b
        for n, m in self._modules.items():
            out.update(m.state_dict(prefix + n + "."))
        return out

    def _named_slots(self, prefix: str = "") -> dict:
        """Dotted name -> (owner module, attr, kind) for every
        parameter and buffer — the write-side mirror of state_dict."""
        out = {}
        for n in self._params:
            out[prefix + n] = (self, n, "param")
        for n in self._buffers:
            out[prefix + n] = (self, n, "buffer")
        for n, m in self._modules.items():
            out.update(m._named_slots(prefix + n + "."))
        return out

    def load_state_dict(self, state: dict, strict: bool = True):
        """torch-parity semantics: strict=True raises on missing or
        unexpected keys, and every value must match the slot's shape —
        so a synthetic checkpoint exercises the remap/bijection exactly
        the way real torch loading would."""
        slots = self._named_slots()
        missing = sorted(set(slots) - set(state))
        unexpected = sorted(set(state) - set(slots))
        if strict and (missing or unexpected):
            raise KeyError(
                f"load_state_dict: missing={missing[:5]} "
                f"unexpected={unexpected[:5]}"
            )
        for k, v in state.items():
            if k not in slots:
                continue
            owner, attr, kind = slots[k]
            cur = np.asarray(getattr(owner, attr))
            arr = np.asarray(v)
            if tuple(arr.shape) != tuple(cur.shape):
                raise ValueError(
                    f"load_state_dict: shape mismatch for {k}: "
                    f"{arr.shape} vs {cur.shape}"
                )
            if kind == "param":
                owner._params[attr] = arr.view(Parameter)
                object.__setattr__(owner, attr, owner._params[attr])
            else:
                owner._buffers[attr] = arr
                object.__setattr__(owner, attr, arr)
        return self


class Sequential(Module):
    def __init__(self, *mods):
        super().__init__()
        for i, m in enumerate(mods):
            setattr(self, str(i), m)
        self._order = [str(i) for i in range(len(mods))]

    def forward(self, x):
        for n in self._order:
            x = getattr(self, n)(x)
        return x


class ModuleList(Module):
    def __init__(self, mods=()):
        super().__init__()
        self._order = []
        for m in mods:
            setattr(self, str(len(self._order)), m)
            self._order.append(str(len(self._order)))

    def __iter__(self):
        return (getattr(self, n) for n in self._order)

    def __getitem__(self, i):
        return getattr(self, self._order[i])


class ReLU(Module):
    def __init__(self, inplace: bool = False):
        super().__init__()

    def forward(self, x):
        return _t(np.maximum(np.asarray(x), 0.0))


class Conv2d(Module):
    def __init__(self, c_in, c_out, kernel_size, stride=1, padding=0,
                 dilation=1, groups=1, bias=True):
        super().__init__()
        assert groups == 1
        self.k = _pair(kernel_size)
        self.s = _pair(stride)
        self.p = _pair(padding)
        self.d = _pair(dilation)
        self.weight = _param(c_out, c_in, *self.k)
        self.bias = _param(c_out) if bias else None

    def forward(self, x):
        x = np.asarray(x, dtype=np.float64)
        (kh, kw), (sh, sw), (ph, pw), (dh, dw) = self.k, self.s, self.p, self.d
        xp = np.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
        n, _, hp, wp = xp.shape
        ho = (hp - dh * (kh - 1) - 1) // sh + 1
        wo = (wp - dw * (kw - 1) - 1) // sw + 1
        w = np.asarray(self.weight, dtype=np.float64)
        out = np.zeros((n, w.shape[0], ho, wo))
        for ki in range(kh):
            for kj in range(kw):
                sl = xp[:, :, ki * dh : ki * dh + ho * sh : sh,
                        kj * dw : kj * dw + wo * sw : sw]
                out += np.einsum("oc,nchw->nohw", w[:, :, ki, kj], sl)
        if self.bias is not None:
            out += np.asarray(self.bias)[None, :, None, None]
        return _t(out)


class MaxPool2d(Module):
    def __init__(self, kernel_size, stride=None, padding=0):
        super().__init__()
        self.k = _pair(kernel_size)
        self.s = _pair(stride) if stride is not None else self.k
        self.p = _pair(padding)

    def forward(self, x):
        x = np.asarray(x, dtype=np.float64)
        (kh, kw), (sh, sw), (ph, pw) = self.k, self.s, self.p
        xp = np.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)),
                    constant_values=-np.inf)
        n, c, hp, wp = xp.shape
        ho = (hp - kh) // sh + 1
        wo = (wp - kw) // sw + 1
        out = np.full((n, c, ho, wo), -np.inf)
        for ki in range(kh):
            for kj in range(kw):
                np.maximum(
                    out, xp[:, :, ki : ki + ho * sh : sh, kj : kj + wo * sw : sw],
                    out=out,
                )
        return _t(out)


class BatchNorm2d(Module):
    EPS = 1e-5

    def __init__(self, ch: int):
        super().__init__()
        self.weight = _param(ch)
        self.bias = _param(ch)
        self.register_buffer("running_mean", np.zeros(ch))
        self.register_buffer("running_var", np.ones(ch))
        self.register_buffer("num_batches_tracked", np.zeros((), dtype=np.int64))

    def forward(self, x):
        x = np.asarray(x, dtype=np.float64)
        inv = 1.0 / np.sqrt(self.running_var + self.EPS)
        scale = (np.asarray(self.weight) * inv)[None, :, None, None]
        shift = (
            np.asarray(self.bias) - np.asarray(self.running_mean)
            * np.asarray(self.weight) * inv
        )[None, :, None, None]
        return _t(x * scale + shift)


class AdaptiveAvgPool2d(Module):
    def __init__(self, output_size):
        super().__init__()
        assert tuple(output_size) == (None, 1), "shim supports (None, 1) only"

    def forward(self, x):
        return _t(np.asarray(x, dtype=np.float64).mean(axis=3, keepdims=True))


class Linear(Module):
    def __init__(self, n_in: int, n_out: int, bias: bool = True):
        super().__init__()
        self.weight = _param(n_out, n_in)
        self.bias = _param(n_out) if bias else None

    def forward(self, x):
        y = np.asarray(x, dtype=np.float64) @ np.asarray(self.weight).T
        if self.bias is not None:
            y = y + np.asarray(self.bias)
        return _t(y)


class LSTM(Module):
    """Single-layer (bi)LSTM, batch_first, torch gate order i,f,g,o."""

    def __init__(self, n_in: int, n_hidden: int, bidirectional: bool = False,
                 batch_first: bool = False):
        super().__init__()
        assert batch_first, "shim models the batch_first calls only"
        self.h = n_hidden
        self.bidirectional = bidirectional
        self.weight_ih_l0 = _param(4 * n_hidden, n_in)
        self.weight_hh_l0 = _param(4 * n_hidden, n_hidden)
        self.bias_ih_l0 = _param(4 * n_hidden)
        self.bias_hh_l0 = _param(4 * n_hidden)
        if bidirectional:
            self.weight_ih_l0_reverse = _param(4 * n_hidden, n_in)
            self.weight_hh_l0_reverse = _param(4 * n_hidden, n_hidden)
            self.bias_ih_l0_reverse = _param(4 * n_hidden)
            self.bias_hh_l0_reverse = _param(4 * n_hidden)

    def _run(self, x, wi, wh, bi, bh, reverse: bool):
        n, t, _ = x.shape
        hsz = self.h
        hcur = np.zeros((n, hsz))
        ccur = np.zeros((n, hsz))
        steps = range(t - 1, -1, -1) if reverse else range(t)
        out = np.zeros((n, t, hsz))
        for ti in steps:
            g = x[:, ti] @ wi.T + hcur @ wh.T + bi + bh
            i = 1.0 / (1.0 + np.exp(-g[:, :hsz]))
            f = 1.0 / (1.0 + np.exp(-g[:, hsz : 2 * hsz]))
            c_hat = np.tanh(g[:, 2 * hsz : 3 * hsz])
            o = 1.0 / (1.0 + np.exp(-g[:, 3 * hsz :]))
            ccur = f * ccur + i * c_hat
            hcur = o * np.tanh(ccur)
            out[:, ti] = hcur
        return out

    def forward(self, x):
        x = np.asarray(x, dtype=np.float64)
        fwd = self._run(
            x, np.asarray(self.weight_ih_l0), np.asarray(self.weight_hh_l0),
            np.asarray(self.bias_ih_l0), np.asarray(self.bias_hh_l0), False,
        )
        if not self.bidirectional:
            return _t(fwd), None
        bwd = self._run(
            x, np.asarray(self.weight_ih_l0_reverse),
            np.asarray(self.weight_hh_l0_reverse),
            np.asarray(self.bias_ih_l0_reverse),
            np.asarray(self.bias_hh_l0_reverse), True,
        )
        return _t(np.concatenate([fwd, bwd], axis=2)), None


def _bilinear(x, size):
    n, c, h, w = x.shape
    h2, w2 = int(size[0]), int(size[1])

    def grid(dst, src):
        pos = (np.arange(dst) + 0.5) * (src / dst) - 0.5
        lo = np.clip(np.floor(pos).astype(np.int64), 0, src - 1)
        hi = np.clip(lo + 1, 0, src - 1)
        frac = np.clip(pos - lo, 0.0, 1.0)
        return lo, hi, frac

    ylo, yhi, yf = grid(h2, h)
    xlo, xhi, xf = grid(w2, w)
    rows_lo = x[:, :, ylo]
    rows_hi = x[:, :, yhi]
    top = rows_lo[:, :, :, xlo] * (1 - xf) + rows_lo[:, :, :, xhi] * xf
    bot = rows_hi[:, :, :, xlo] * (1 - xf) + rows_hi[:, :, :, xhi] * xf
    return top * (1 - yf[:, None]) + bot * yf[:, None]


def interpolate(x, size=None, mode: str = "bilinear",
                align_corners: bool = False):
    """Bilinear resize, align_corners=False (torch's sampling grid:
    src = (dst + 0.5) * scale - 0.5, edge-clamped)."""
    assert mode == "bilinear" and not align_corners
    return _t(_bilinear(np.asarray(x, dtype=np.float64), size))


@contextlib.contextmanager
def installed():
    """Temporarily provide this module as ``torch`` (+ ``torch.nn``,
    ``torch.nn.functional``) in sys.modules so the deferred imports in
    the backend builders resolve. No-op pass-through when real torch is
    importable; always restores sys.modules."""
    # probe OUTSIDE the yield: a bare try around `yield` would swallow
    # ImportErrors raised by the caller's body and re-enter the shim
    # path (double-yield)
    try:
        import torch  # noqa: F401

        have_torch = True
    except ImportError:
        have_torch = False
    if have_torch:
        yield
        return
    me = sys.modules[__name__]
    nn_mod = types.ModuleType("torch.nn")
    for name in (
        "Module", "Sequential", "ModuleList", "ReLU", "Conv2d", "MaxPool2d",
        "BatchNorm2d", "AdaptiveAvgPool2d", "Linear", "LSTM", "Parameter",
    ):
        setattr(nn_mod, name, getattr(me, name))
    f_mod = types.ModuleType("torch.nn.functional")
    f_mod.interpolate = interpolate
    nn_mod.functional = f_mod
    torch_mod = types.ModuleType("torch")
    for name in ("cat", "from_numpy", "no_grad", "softmax", "zeros", "Tensor",
                 "load", "save"):
        setattr(torch_mod, name, getattr(me, name))
    torch_mod.nn = nn_mod
    saved = {
        k: sys.modules.get(k) for k in ("torch", "torch.nn", "torch.nn.functional")
    }
    sys.modules["torch"] = torch_mod
    sys.modules["torch.nn"] = nn_mod
    sys.modules["torch.nn.functional"] = f_mod
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
