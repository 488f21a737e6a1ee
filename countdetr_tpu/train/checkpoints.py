"""Checkpointing: Orbax for native checkpoints + a one-way importer from the
reference's torch .pth state_dicts (reference main.py:223-238,297-311).

Native layout (Orbax): {params, opt_state, step, epoch} with the config JSON
alongside — same logical content the reference pickles
({model, optimizer, lr_scheduler, epoch, args}, main.py:302-311).

Torch import: maps the reference module tree (SURVEY.md section 2.1) onto our
flax param tree. Notable transforms:
  * conv weights OIHW -> HWIO;
  * LayerNorm/GroupNorm weight -> scale;
  * shared decoder heads: the reference stores the same tensor 6x as
    cls_embed.{0..5} (transformer.py:96-97); we read index 0;
  * bbox head bias: the reference folds the -2.0 wh bias into the layer bias
    (transformer.py:95); our model adds it explicitly, so the import
    subtracts it;
  * stage-1 cls bias is shape (1,) due to a reference init quirk
    (transformer.py:88 with num_classes=1) and broadcasts to (num_classes,).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


# ---------------------------------------------------------------------------
# Orbax native checkpoints
# ---------------------------------------------------------------------------

def config_to_dict(cfg) -> Dict:
    """Full config snapshot as a plain JSON-able dict (the reference pickles
    args into every checkpoint — main.py:302-311)."""
    import dataclasses

    return dataclasses.asdict(cfg)


def _state_payload(state) -> Dict:
    payload = {"params": state.params, "opt_state": state.opt_state}
    if getattr(state, "step", None) is not None:
        # optimizer step counter: --resume must restore the StepLR position
        # and the dropout fold_in stream, not just params (the reference
        # restores model+optimizer+lr_scheduler+epoch, main.py:217-238)
        payload["step"] = state.step
    return payload


def _write_meta(directory: str, step: int, extra: Optional[Dict], cfg):
    """Rank-0 side-car metadata + the latest.json pointer. Called only once
    the Orbax write has COMMITTED — latest.json advancing is what makes a
    checkpoint visible to --auto_resume, so a crash mid-write resumes from
    the previous committed step instead of a torn one."""
    if jax.process_index() != 0:
        return
    meta = {"step": int(step)}
    meta.update(extra or {})
    if cfg is not None:
        meta["config"] = config_to_dict(cfg)
    with open(os.path.join(directory, f"checkpoint_{step}.meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(directory, "latest.json"), "w") as f:
        json.dump({"step": int(step)}, f)
    # retention: GC runs after every publish, policy from the config
    t = getattr(cfg, "train", None)
    if t is not None and getattr(t, "checkpoint_keep_last", 0) > 0:
        gc_checkpoints(
            directory,
            keep_last=t.checkpoint_keep_last,
            keep_every=t.checkpoint_keep_every,
            lr_drop=t.lr_drop,
            drop_epochs=t.lr_drop_epochs,
        )


def gc_checkpoints(directory: str, keep_last: int = 1, keep_every: int = 10,
                   lr_drop: Optional[int] = None, drop_epochs=None):
    """Bounded-disk retention mirroring the reference's policy: it overwrites
    one rolling checkpoint.pth every epoch and keeps permanent snapshots at
    every 10th epoch and at lr-drop epochs (main.py:297-311 — the
    `(epoch+1) % lr_drop == 0 or (epoch+1) % 10 == 0` condition). We keep:
    the `keep_last` most recent COMMITTED checkpoints, every checkpoint with
    (epoch+1) % keep_every == 0, and lr-drop-epoch snapshots. Uncommitted
    directories (no side-car meta — e.g. an in-flight async write) are never
    touched. Without this, a 1200-epoch stage-2 schedule at
    checkpoint_every=1 would leave ~1200 full checkpoints on disk."""
    import re
    import shutil

    def committed(s):
        return os.path.exists(
            os.path.join(directory, f"checkpoint_{s}.meta.json")
        )

    steps = sorted(
        int(m.group(1))
        for name in os.listdir(directory)
        if (m := re.fullmatch(r"checkpoint_(\d+)", name))
        and os.path.isdir(os.path.join(directory, name))
    )
    done = [s for s in steps if committed(s)]
    keep = set(done[-max(keep_last, 1):])
    latest = latest_step(directory)
    if latest is not None:
        keep.add(latest)
    drops = set(drop_epochs or [])
    for s in done:
        # CLI saves use the epoch as the checkpoint id (cli/main.py:687-695)
        if keep_every and (s + 1) % keep_every == 0:
            keep.add(s)
        if lr_drop and (s + 1) % lr_drop == 0:
            keep.add(s)
        if (s + 1) in drops:
            keep.add(s)
    for s in done:
        if s in keep:
            continue
        shutil.rmtree(
            os.path.join(directory, f"checkpoint_{s}"), ignore_errors=True
        )
        try:
            os.remove(os.path.join(directory, f"checkpoint_{s}.meta.json"))
        except OSError:
            pass


def save_checkpoint(
    directory: str, step: int, state, extra: Optional[Dict] = None, cfg=None
):
    """Synchronous save (blocks until the write commits).

    Multi-process note: unlike the reference's torch save_on_master
    (util/misc.py:394-396), Orbax saving of global jax.Arrays is a
    COLLECTIVE — every process must call this (only rank 0 writes the
    side-car metadata files). Requires a shared filesystem across hosts.
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    path = os.path.join(directory, f"checkpoint_{step}")
    ckpt.save(path, _state_payload(state), force=True)
    ckpt.wait_until_finished()
    _write_meta(directory, step, extra, cfg)


class AsyncSaver:
    """Non-blocking checkpointing: the epoch loop resumes training while
    Orbax serializes in background threads.

    The reference blocks the loop on a synchronous torch.save every epoch
    (main.py:297-311); orbax's AsyncCheckpointer instead returns once the
    arrays are copied OUT of device memory (so donated buffers may be
    reused by the next train step immediately) and writes to disk behind
    the compute. save() first finalizes the PREVIOUS pending write — an
    epoch of compute has usually already hidden it, making the wait ~free —
    and only then publishes that write's metadata, so latest.json never
    points at an uncommitted checkpoint. Call finalize() once after the
    training loop (and before reading the directory back).

    Multi-process: save()/finalize() are collective like save_checkpoint.
    """

    def __init__(self):
        self._ckpt = None
        self._pending = None  # (directory, step, extra, cfg)

    def save(self, directory: str, step: int, state,
             extra: Optional[Dict] = None, cfg=None):
        import orbax.checkpoint as ocp

        if self._ckpt is None:
            self._ckpt = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self.finalize()
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"checkpoint_{step}")
        self._ckpt.save(
            path, args=ocp.args.StandardSave(_state_payload(state)),
            force=True,
        )
        self._pending = (directory, step, extra, cfg)

    def finalize(self):
        """Block until the in-flight write commits, then publish its
        metadata. Idempotent; no-op when nothing is pending."""
        if self._ckpt is not None:
            self._ckpt.wait_until_finished()
        if self._pending is not None:
            directory, step, extra, cfg = self._pending
            _write_meta(directory, step, extra, cfg)
            self._pending = None


def latest_step(directory: str) -> Optional[int]:
    p = os.path.join(directory, "latest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(json.load(f)["step"])


def restore_checkpoint(directory: str, step: int, state):
    """Returns (params, opt_state, meta). meta additionally carries
    'opt_step' (the optimizer step counter) when the checkpoint stores one
    — older checkpoints without it restore with opt_step absent."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    ckpt = ocp.StandardCheckpointer()
    path = os.path.join(directory, f"checkpoint_{step}")
    target = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    try:
        restored = ckpt.restore(path, target)
    except Exception:
        # pre-round-3 checkpoints lack the 'step' entry
        target.pop("step")
        restored = ckpt.restore(path, target)
    meta_path = os.path.join(directory, f"checkpoint_{step}.meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    if "step" in restored:
        meta["opt_step"] = restored["step"]
    return restored["params"], restored["opt_state"], meta


# ---------------------------------------------------------------------------
# torch .pth import
# ---------------------------------------------------------------------------

_STAGE_IDX = {1: "layer1", 2: "layer2", 3: "layer3", 4: "layer4"}


def _set(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def torch_state_dict_to_params(
    sd: Dict[str, "np.ndarray"], template: Any, strict: bool = False,
    skip_mismatched: bool = False,
) -> Any:
    """Convert a reference torch state_dict (tensors or ndarrays) into our
    param pytree, shaped like `template` (a flax variables dict).

    skip_mismatched: keep the template's init value for shape-mismatched
    entries instead of erroring — the reference does the same when query
    counts change (it drops transformer.pattern.weight, main.py:229-232)."""

    def arr(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t, dtype=np.float32)

    # DETRsegm wraps the whole model under 'detr.' (reference
    # segmentation.py:30-41); strip the prefix so the inner mapping below
    # applies unchanged, keeping bbox_attention/mask_head at the top level
    if any(k.startswith("detr.") for k in sd):
        sd = {
            (k[len("detr."):] if k.startswith("detr.") else k): v
            for k, v in sd.items()
        }

    out: Dict = {"params": {}}
    p = out["params"]
    used = set()

    def take(key):
        used.add(key)
        return arr(sd[key])

    def conv(key):
        return np.transpose(take(key), (2, 3, 1, 0))  # OIHW -> HWIO

    # ---- backbone ---------------------------------------------------------
    bb_prefix = None
    for cand in ("backbone.body.", "backbone.0.body."):
        if any(k.startswith(cand) for k in sd):
            bb_prefix = cand
            break
    if bb_prefix:
        bb: Dict = {}
        for key in [k for k in sd if k.startswith(bb_prefix)]:
            rel = key[len(bb_prefix):]
            parts = rel.split(".")
            if parts[0] == "conv1":
                _set(bb, ("conv1", "kernel"), conv(key))
            elif parts[0] == "bn1":
                _set(bb, ("bn1", parts[1]), take(key))
            elif parts[0].startswith("layer"):
                block = f"{parts[0]}_{parts[1]}"
                mod = parts[2]
                if mod.startswith("conv"):
                    _set(bb, (block, mod, "kernel"), conv(key))
                elif mod.startswith("bn"):
                    _set(bb, (block, mod, parts[3]), take(key))
                elif mod == "downsample":
                    if parts[3] == "0":  # conv
                        _set(bb, (block, "downsample_conv", "kernel"), conv(key))
                    else:  # bn
                        _set(bb, (block, "downsample_bn", parts[4]), take(key))
        p["backbone"] = bb

    # ---- input projections ------------------------------------------------
    def proj_block(prefix):
        return {
            "conv": {
                "kernel": conv(f"{prefix}.0.weight"),
                "bias": take(f"{prefix}.0.bias"),
            },
            "norm": {
                "scale": take(f"{prefix}.1.weight"),
                "bias": take(f"{prefix}.1.bias"),
            },
        }

    multi_level = "input_proj.1.0.weight" in sd
    if multi_level:
        # one proj per level (reference anchor_detr.py:49-65); our modules
        # are input_proj_{lv}
        lv = 0
        while f"input_proj.{lv}.0.weight" in sd:
            p[f"input_proj_{lv}"] = proj_block(f"input_proj.{lv}")
            lv += 1
    elif "input_proj.0.0.weight" in sd:
        p["input_proj"] = proj_block("input_proj.0")
    if "aggr_input_proj.0.0.weight" in sd:
        p["aggr_input_proj"] = proj_block("aggr_input_proj.0")

    # ---- transformer ------------------------------------------------------
    tr: Dict = {}
    tp = "transformer."

    def attn_block(prefix):
        return {
            "in_proj_weight": take(prefix + "in_proj_weight"),
            "in_proj_bias": take(prefix + "in_proj_bias"),
            "out_proj_weight": take(prefix + "out_proj.weight"),
            "out_proj_bias": take(prefix + "out_proj.bias"),
        }

    def ln(prefix):
        return {"scale": take(prefix + "weight"), "bias": take(prefix + "bias")}

    def linear(prefix):
        return {"weight": take(prefix + "weight"), "bias": take(prefix + "bias")}

    def ffn(prefix):
        return {
            "linear1": linear(prefix + "linear1."),
            "linear2": linear(prefix + "linear2."),
            "norm2": ln(prefix + "norm2."),
        }

    i = 0
    while f"{tp}encoder_layers.{i}.self_attn.in_proj_weight" in sd:
        tr[f"encoder_{i}"] = {
            "self_attn": attn_block(f"{tp}encoder_layers.{i}.self_attn."),
            "norm1": ln(f"{tp}encoder_layers.{i}.norm1."),
            "ffn": ffn(f"{tp}encoder_layers.{i}.ffn."),
        }
        i += 1
    i = 0
    while f"{tp}encoder_layers_level.{i}.self_attn_level.in_proj_weight" in sd:
        # cross-level attention layers interleave with spatial ones when
        # num_feature_levels > 1 (reference transformer.py:46-59)
        tr[f"encoder_level_{i}"] = {
            "self_attn_level": attn_block(
                f"{tp}encoder_layers_level.{i}.self_attn_level."
            ),
            "norm1": ln(f"{tp}encoder_layers_level.{i}.norm1."),
            "ffn": ffn(f"{tp}encoder_layers_level.{i}.ffn."),
        }
        i += 1
    i = 0
    while f"{tp}decoder_layers.{i}.self_attn.in_proj_weight" in sd:
        tr[f"decoder_{i}"] = {
            "self_attn": attn_block(f"{tp}decoder_layers.{i}.self_attn."),
            "cross_attn": attn_block(f"{tp}decoder_layers.{i}.cross_attn."),
            "norm1": ln(f"{tp}decoder_layers.{i}.norm1."),
            "norm2": ln(f"{tp}decoder_layers.{i}.norm2."),
            "ffn": ffn(f"{tp}decoder_layers.{i}.ffn."),
        }
        if f"{tp}decoder_layers.{i}.level_fc.weight" in sd:
            # per-pixel level merge after cross-attn (transformer.py:343,401)
            tr[f"decoder_{i}"]["level_fc"] = linear(
                f"{tp}decoder_layers.{i}.level_fc."
            )
        i += 1
    if f"{tp}level_embed.weight" in sd:
        tr["level_embed"] = take(f"{tp}level_embed.weight")

    for torch_name in ("modify_pattern", "pattern"):
        if f"{tp}{torch_name}.weight" in sd:
            tr["pattern"] = take(f"{tp}{torch_name}.weight")
    for ap in ("adapt_pos1d", "adapt_pos2d"):
        if f"{tp}{ap}.0.weight" in sd:
            tr[ap] = {
                "0": linear(f"{tp}{ap}.0."),
                "2": linear(f"{tp}{ap}.2."),
            }

    # shared heads: stored 6x, read index 0
    if f"{tp}cls_embed.0.weight" in sd:
        w = take(f"{tp}cls_embed.0.weight")
        b = take(f"{tp}cls_embed.0.bias")
        num_classes = w.shape[0]
        if b.shape[0] != num_classes:  # stage-1 (1,)-bias quirk
            b = np.broadcast_to(b, (num_classes,)).copy()
        tr["cls_embed"] = {"weight": w, "bias": b}
        # mark duplicate head keys as consumed
        j = 1
        while f"{tp}cls_embed.{j}.weight" in sd:
            used.add(f"{tp}cls_embed.{j}.weight")
            used.add(f"{tp}cls_embed.{j}.bias")
            j += 1
    if f"{tp}bbox_embed.0.layers.0.weight" in sd:
        layers = {}
        for j in range(3):
            layers[f"layers_{j}"] = linear(f"{tp}bbox_embed.0.layers.{j}.")
        # our forward adds wh_bias [0,0,-2,-2] explicitly
        layers["layers_2"]["bias"] = layers["layers_2"]["bias"] - np.array(
            [0.0, 0.0, -2.0, -2.0], dtype=np.float32
        )
        tr["bbox_embed"] = layers
        j = 1
        while f"{tp}bbox_embed.{j}.layers.0.weight" in sd:
            for l in range(3):
                used.add(f"{tp}bbox_embed.{j}.layers.{l}.weight")
                used.add(f"{tp}bbox_embed.{j}.layers.{l}.bias")
            j += 1
    if f"{tp}bbox_variance.0.layers.0.weight" in sd:
        tr["bbox_variance"] = {
            f"layers_{j}": linear(f"{tp}bbox_variance.0.layers.{j}.")
            for j in range(3)
        }
        j = 1
        while f"{tp}bbox_variance.{j}.layers.0.weight" in sd:
            for l in range(3):
                used.add(f"{tp}bbox_variance.{j}.layers.{l}.weight")
                used.add(f"{tp}bbox_variance.{j}.layers.{l}.bias")
            j += 1
    if f"{tp}position.weight" in sd:
        p["position"] = take(f"{tp}position.weight")

    p["transformer"] = tr

    # ---- DETRsegm mask branch (reference segmentation.py:30-41,74-160) ----
    if "bbox_attention.q_linear.weight" in sd:
        p["bbox_attention"] = {
            name: {
                "kernel": take(f"bbox_attention.{name}.weight").T,
                "bias": take(f"bbox_attention.{name}.bias"),
            }
            for name in ("q_linear", "k_linear")
        }
    if "mask_head.lay1.weight" in sd:
        mh: Dict = {}
        for mod in ("lay1", "lay2", "lay3", "lay4", "lay5", "out_lay",
                    "adapter1", "adapter2", "adapter3"):
            mh[mod] = {
                "kernel": conv(f"mask_head.{mod}.weight"),
                "bias": take(f"mask_head.{mod}.bias"),
            }
        for j in range(1, 6):
            mh[f"gn{j}"] = {
                "scale": take(f"mask_head.gn{j}.weight"),
                "bias": take(f"mask_head.gn{j}.bias"),
            }
        p["mask_head"] = mh

    if strict:
        # the reference itself ignores thop's profiling counters when
        # loading (main.py:231 filters *total_params/*total_ops)
        ignorable = ("total_params", "total_ops")
        missing = [
            k for k in sd
            if k not in used and not k.endswith(ignorable)
        ]
        if missing:
            raise KeyError(
                "unconsumed torch keys (mapping bug or unsupported "
                f"architecture): {missing[:10]}"
                f" (+{max(len(missing) - 10, 0)} more)"
            )

    # conform to the template tree: drop imported params the model doesn't
    # have (e.g. the stage-2 torch model keeps an unused plain input_proj
    # next to aggr_input_proj — reference anchor_detr.py:67-84), error on
    # template params the import failed to provide, check shapes/dtypes.
    def prune(src, tmpl):
        if isinstance(tmpl, dict):
            out_d = {}
            for k, tv in tmpl.items():
                if not isinstance(src, dict) or k not in src:
                    raise KeyError(f"torch import missing param '{k}'")
                out_d[k] = prune(src[k], tv)
            return out_d
        v = np.asarray(src)
        t = np.asarray(tmpl)
        if t.shape != v.shape:
            if skip_mismatched:
                print(
                    f"skipping mismatched import: {t.shape} != {v.shape} "
                    "(keeping init value)"
                )
                return t
            raise ValueError(
                f"shape mismatch: template {t.shape} vs import {v.shape}"
            )
        return v.astype(t.dtype)

    return prune(out, jax.tree_util.tree_map(lambda x: x, template))


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth; returns the model state_dict as numpy arrays."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("model", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
