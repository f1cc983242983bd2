"""Import reference-style PyTorch checkpoints into this framework.

Migration path for upstream-repo users (SURVEY.md §2 C12 "torch.save
state dicts", docs/MIGRATION.md): take a ``torch.save``'d checkpoint of
a cascade-topology U-Net — double 3^3-conv + InstanceNorm(affine) +
activation blocks, trilinear up/down, 1^3 head, the topology SURVEY.md
§3.4 reconstructs — and produce this repo's flat params export
(train/checkpoint.py ``export_params`` format), which predict / serve /
evaluate load directly.

Mapping strategy: STRUCTURAL — by module-registration order plus shape
checks — not by key names. A torch ``state_dict`` preserves registration
order, and the reference topology registers blocks encoder -> decoder ->
head, the same order this repo's ``UNet3D`` auto-names
``DoubleConv_0..N`` / ``head``. Upstream key names are arbitrary, so they
are never trusted; every slot's shape is verified. Two torch-isms are
handled explicitly:

* **Conv biases feeding an InstanceNorm are dropped** (with a note): IN
  subtracts the per-channel spatial mean, so a constant per-channel shift
  is algebraically invisible — the imported net is exactly equivalent
  (verified in tests/test_import_torch.py).
* **InstanceNorm without affine** (``affine=False``): the slot is filled
  with scale=1 / bias=0, which is the same function.

Running stats (``running_mean``/``running_var``/``num_batches_tracked``)
are ignored — InstanceNorm inference in this repo always uses per-sample
statistics, matching ``torch.nn.InstanceNorm3d``'s default
``track_running_stats=False`` semantics.

torch is imported lazily — only this importer needs it; the train and
serving paths never do.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

# wrapper keys commonly used around a state dict in torch checkpoints
_WRAPPER_KEYS = ("state_dict", "model_state_dict", "model", "net", "weights")
_STAT_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


class TorchImportError(ValueError):
    """Structural mismatch between the torch checkpoint and the target net."""


def load_torch_state(path: str) -> "Dict[str, np.ndarray]":
    """Load a torch checkpoint file into an ORDERED {key: np.ndarray}.

    Accepts ``torch.save`` pickles (state dict, wrapper dict, or module)
    and ``.safetensors`` files. Unwraps the common checkpoint-dict
    wrappers, strips ``module.`` (DataParallel) prefixes, converts
    tensors to numpy, and drops batch-norm-style running statistics.
    CAVEAT: safetensors writers typically SORT keys, which destroys the
    registration order the structural matcher relies on (``blocks.10``
    sorts before ``blocks.2``). safetensors input therefore usually needs
    an explicit ``--map``; the matcher's shape checks will fail loudly,
    never silently misassign, if sorted order happens to disagree.
    """
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        state = {
            k: v
            for k, v in load_file(path).items()
            if k.split(".")[-1] not in _STAT_SUFFIXES
        }
        if not state:
            raise TorchImportError("safetensors file has no tensors")
        return {
            (k[len("module."):] if k.startswith("module.") else k): v
            for k, v in state.items()
        }
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # full-pickle checkpoints (e.g. torch.save(model)) need the
        # unrestricted unpickler; only do this for a file the user
        # explicitly pointed the importer at
        obj = torch.load(path, map_location="cpu", weights_only=False)
    return flatten_state_dict(obj)


def flatten_state_dict(obj: Any) -> "Dict[str, np.ndarray]":
    import torch

    if isinstance(obj, torch.nn.Module):
        obj = obj.state_dict()
    if not isinstance(obj, dict):
        raise TorchImportError(
            f"expected a state dict (or a wrapper dict), got {type(obj)!r}"
        )
    # unwrap {"state_dict": {...}}-style containers (pick the first wrapper
    # key whose value is a dict of tensors)
    if not any(isinstance(v, torch.Tensor) for v in obj.values()):
        for wk in _WRAPPER_KEYS:
            inner = obj.get(wk)
            if isinstance(inner, dict) and any(
                isinstance(v, torch.Tensor) for v in inner.values()
            ):
                obj = inner
                break
        else:
            raise TorchImportError(
                "no tensors found; top-level keys: "
                + ", ".join(map(repr, list(obj)[:10]))
            )
    out: Dict[str, np.ndarray] = {}
    for k, v in obj.items():
        if not isinstance(v, torch.Tensor):
            continue
        if k.split(".")[-1] in _STAT_SUFFIXES:
            continue
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    if not out:
        raise TorchImportError("state dict contained no parameter tensors")
    return out


# ---------------------------------------------------------------------------
# target-side slot enumeration


def enumerate_slots(params: Any) -> List[Tuple[Tuple[str, ...], str, tuple]]:
    """Ordered (path, kind, shape) slots of a UNet3D params tree.

    Order mirrors the forward pass / torch registration order: DoubleConv
    blocks by index (encoder 0..L-1, then decoder in application order —
    models/unet3d.py auto-naming), within each block ConvNormAct_0 then
    ConvNormAct_1, within each [conv kernel, IN scale, IN bias]; finally
    head kernel + bias. kind in {conv, in_scale, in_bias, head_kernel,
    head_bias}.
    """
    p = params["params"] if "params" in params else params
    unknown = [
        k for k in p
        if not (k.startswith("DoubleConv_") or k == "head")
    ]
    if unknown:
        raise TorchImportError(
            "target net has parameter groups the torch importer does not "
            f"map (deep-supervision aux heads?): {sorted(unknown)} — "
            "import targets plain inference topologies "
            "(e.g. --preset reference_parity)"
        )
    slots: List[Tuple[Tuple[str, ...], str, tuple]] = []
    dc_names = sorted(
        (k for k in p if k.startswith("DoubleConv_")),
        key=lambda s: int(s.split("_")[1]),
    )
    for name in dc_names:
        for cna in ("ConvNormAct_0", "ConvNormAct_1"):
            sub = p[name][cna]
            slots.append(
                ((name, cna, "Conv_0", "kernel"), "conv",
                 tuple(np.shape(sub["Conv_0"]["kernel"])))
            )
            slots.append(
                ((name, cna, "in_scale"), "in_scale",
                 tuple(np.shape(sub["in_scale"])))
            )
            slots.append(
                ((name, cna, "in_bias"), "in_bias",
                 tuple(np.shape(sub["in_bias"])))
            )
    slots.append((("head", "kernel"), "head_kernel",
                  tuple(np.shape(p["head"]["kernel"]))))
    slots.append((("head", "bias"), "head_bias",
                  tuple(np.shape(p["head"]["bias"]))))
    return slots


def _torch_conv_to_jax(w: np.ndarray) -> np.ndarray:
    """(O, I, kd, kh, kw) -> (kd, kh, kw, I, O)."""
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))


def _is_conv(shape: tuple) -> bool:
    return len(shape) == 5


def _prefix(key: str) -> str:
    return key.rsplit(".", 1)[0] if "." in key else key


# ---------------------------------------------------------------------------
# structural matcher


def match_state(
    state: Dict[str, np.ndarray],
    slots: List[Tuple[Tuple[str, ...], str, tuple]],
    mapping: Optional[Dict[str, str]] = None,
) -> Tuple[Dict[Tuple[str, ...], np.ndarray], List[str]]:
    """Assign torch tensors to target slots. Returns (assignment, notes).

    With ``mapping`` (``{"DoubleConv_0/ConvNormAct_0/Conv_0/kernel":
    "<torch key>", ...}``) every slot is looked up explicitly; otherwise
    tensors are consumed in state-dict order with shape checks.
    """
    if mapping is not None:
        return _match_explicit(state, slots, mapping)
    return _match_structural(state, slots)


def _match_explicit(state, slots, mapping):
    notes: List[str] = []
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    for path, kind, shape in slots:
        spath = "/".join(path)
        if spath not in mapping:
            raise TorchImportError(f"--map file is missing slot {spath!r}")
        tkey = mapping[spath]
        if tkey not in state:
            raise TorchImportError(
                f"--map: torch key {tkey!r} (for {spath}) not in checkpoint"
            )
        out[path] = _coerce(state[tkey], kind, shape, tkey)
    extra = set(mapping) - {"/".join(p) for p, _, _ in slots}
    if extra:
        notes.append(f"--map entries ignored (no such slot): {sorted(extra)}")
    return out, notes


def _coerce(arr: np.ndarray, kind: str, shape: tuple, tkey: str) -> np.ndarray:
    if kind in ("conv", "head_kernel"):
        if arr.ndim != 5:
            raise TorchImportError(
                f"{tkey}: expected a 5-D conv weight, got shape {arr.shape}"
            )
        arr = _torch_conv_to_jax(arr)
    if tuple(arr.shape) != shape:
        raise TorchImportError(
            f"{tkey}: shape {tuple(arr.shape)} does not match target slot "
            f"{shape} (after layout transpose for convs) — wrong preset/"
            "stage, or a different topology; run with --list to inspect"
        )
    return arr


def _match_structural(state, slots):
    items = list(state.items())
    notes: List[str] = []
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    ti = 0

    def peek():
        return items[ti] if ti < len(items) else (None, None)

    i = 0
    while i < len(slots):
        path, kind, shape = slots[i]
        spath = "/".join(path)
        key, arr = peek()
        if key is None:
            raise TorchImportError(
                f"torch checkpoint ran out of tensors at slot {spath} "
                f"({len(items)} tensors for {len(slots)} slots) — "
                "different topology? run with --list to inspect"
            )
        if kind in ("conv", "head_kernel"):
            out[path] = _coerce(arr, kind, shape, key)
            ti += 1
            # a conv bias registered right after its weight: for 3^3 convs
            # feeding IN it is absorbed (see module docstring); for the head
            # it becomes head/bias
            nkey, narr = peek()
            if (
                nkey is not None
                and narr.ndim == 1
                and _prefix(nkey) == _prefix(key)
                and nkey.endswith("bias")
            ):
                if kind == "head_kernel":
                    hpath, hkind, hshape = slots[i + 1]
                    assert hkind == "head_bias"
                    out[hpath] = _coerce(narr, hkind, hshape, nkey)
                    ti += 1
                    i += 2
                    continue
                notes.append(
                    f"{nkey}: conv bias dropped (absorbed by the following "
                    "InstanceNorm — exactly equivalent)"
                )
                ti += 1
            i += 1
        elif kind in ("in_scale", "in_bias"):
            if arr is not None and arr.ndim == 1:
                out[path] = _coerce(arr, kind, shape, key)
                ti += 1
            else:
                # InstanceNorm3d(affine=False): no tensors registered
                fill = np.ones(shape, np.float32) if kind == "in_scale" \
                    else np.zeros(shape, np.float32)
                out[path] = fill
                notes.append(
                    f"slot {spath}: no affine tensors in checkpoint "
                    "(InstanceNorm affine=False) — filled with identity"
                )
            i += 1
        elif kind == "head_bias":
            if arr is not None and arr.ndim == 1:
                out[path] = _coerce(arr, kind, shape, key)
                ti += 1
            else:
                out[path] = np.zeros(shape, np.float32)
                notes.append("head bias missing — filled with zeros")
            i += 1
        else:  # pragma: no cover
            raise AssertionError(kind)
    if ti < len(items):
        leftover = [k for k, _ in items[ti:]]
        raise TorchImportError(
            f"{len(leftover)} torch tensors left over after filling every "
            f"slot (first: {leftover[:4]}) — different topology? "
            "run with --list to inspect"
        )
    return out, notes


# ---------------------------------------------------------------------------
# top level


def import_torch_params(
    state: Dict[str, np.ndarray],
    params_like: Any,
    mapping: Optional[Dict[str, str]] = None,
) -> Tuple[Any, List[str]]:
    """Build a params pytree (matching ``params_like``) from a torch state
    dict. Returns (params, notes)."""
    slots = enumerate_slots(params_like)
    assignment, notes = match_state(state, slots, mapping)
    root = {"params": {}}
    for path, arr in assignment.items():
        node = root["params"]
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = arr
    # cast to template dtypes + final structural check
    import jax

    like_flat, treedef = jax.tree_util.tree_flatten(params_like)
    got_flat, got_treedef = jax.tree_util.tree_flatten(root)
    if treedef != got_treedef:
        raise TorchImportError(
            "internal: imported tree structure does not match the template "
            f"({got_treedef} vs {treedef})"
        )
    cast = [
        np.asarray(a, dtype=np.asarray(l).dtype)
        for a, l in zip(got_flat, like_flat)
    ]
    return jax.tree_util.tree_unflatten(treedef, cast), notes


def describe_slots(params_like: Any) -> str:
    lines = []
    for path, kind, shape in enumerate_slots(params_like):
        lines.append(f"  {'/'.join(path):58s} {kind:11s} {shape}")
    return "\n".join(lines)


def describe_state(state: Dict[str, np.ndarray]) -> str:
    return "\n".join(
        f"  {k:58s} {tuple(v.shape)}" for k, v in state.items()
    )


def load_mapping(path: str) -> Dict[str, str]:
    with open(path) as f:
        m = json.load(f)
    if not isinstance(m, dict) or not all(
        isinstance(k, str) and isinstance(v, str) for k, v in m.items()
    ):
        raise TorchImportError("--map file must be a flat {slot: torch_key} "
                               "JSON object")
    return m
