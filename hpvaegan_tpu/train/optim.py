"""Per-scale optimizer construction with per-stage LR groups.

The reference builds a fresh Adam per scale over torch param groups with
depth-decayed learning rates (train_video.py:57-88, train_image.py:53-99,
train_video_baselines.py:55-70).  Here the same grouping becomes an
``optax.multi_transform`` over a label pytree: every leaf of the generator
params-view gets a group label, frozen groups map to ``set_to_zero``.
Gradient clipping (torch clip_grad_norm_ over ALL generator params,
train_video.py:201) is a global-norm clip chained BEFORE the groupwise
transform — identical semantics because frozen groups have exactly-zero
gradients in both frameworks.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import optax

__all__ = [
    "gparams_view",
    "merge_gparams",
    "dparams_view",
    "merge_dparams",
    "hpvaegan_group_plan",
    "baselines_group_plan",
    "g_transform",
    "d_transform",
    "build_g_optimizer",
    "build_d_optimizer",
]


# ---------------------------------------------------------------------------
# Params-view helpers: split trainable params out of the full variables tree
# ---------------------------------------------------------------------------

def gparams_view(gvars: Dict[str, Any]) -> Dict[str, Any]:
    """Extract the params-only pytree from generator variables."""
    view: Dict[str, Any] = {}
    for key, val in gvars.items():
        if key == "body":
            view["body"] = [s["params"] for s in val]
        else:
            view[key] = val["params"]
    return view


def merge_gparams(gvars: Dict[str, Any], params: Dict[str, Any]) -> Dict[str, Any]:
    """Rebuild full generator variables with replaced params."""
    out: Dict[str, Any] = {}
    for key, val in gvars.items():
        if key == "body":
            out["body"] = [{**s, "params": p}
                           for s, p in zip(val, params["body"])]
        else:
            out[key] = {**val, "params": params[key]}
    return out


def dparams_view(dvars: Dict[str, Any]) -> Dict[str, Any]:
    return dvars["params"]


def merge_dparams(dvars: Dict[str, Any], params: Dict[str, Any]) -> Dict[str, Any]:
    return {**dvars, "params": params}


# ---------------------------------------------------------------------------
# Group plans: (label per module, label per body stage, label -> lr)
# ---------------------------------------------------------------------------

def hpvaegan_group_plan(cfg, scale_idx: int, n_body: int
                        ) -> Tuple[Dict[str, str], List[str], Dict[str, float]]:
    """LR-group plan for the HP-VAE-GAN trainers (train_video.py:57-88).

    Returns (module_labels for encode/decoder, body stage labels, lr table).
    """
    body = ["frozen"] * n_body
    lrs: Dict[str, float] = {}

    def assign_tail(depth: int) -> None:
        depth = min(depth, n_body)
        for j, idx in enumerate(range(n_body - depth, n_body)):
            body[idx] = f"b{j}"
            lrs[f"b{j}"] = cfg.lr_g * (cfg.lr_scale ** (depth - 1 - j))

    enc = "frozen"
    if not cfg.train_all:
        if cfg.vae_levels < scale_idx + 1:
            # GAN phase: only the last train_depth' stages
            train_depth = min(cfg.train_depth, n_body - cfg.vae_levels + 1)
            assign_tail(train_depth)
        else:
            # VAE phase: encoder+decoder + last train_depth stages
            enc = "enc"
            lrs["enc"] = cfg.lr_g * (cfg.lr_scale ** scale_idx)
            assign_tail(cfg.train_depth)
    else:
        if n_body < cfg.train_depth:
            enc = "enc"
            lrs["enc"] = cfg.lr_g * (cfg.lr_scale ** scale_idx)
            assign_tail(n_body)
        else:
            assign_tail(cfg.train_depth)

    return {"encode": enc, "decoder": enc}, body, lrs


def baselines_group_plan(cfg, scale_idx: int, n_body: int, has_head: bool
                         ) -> Tuple[Dict[str, str], List[str], Dict[str, float]]:
    """LR-group plan for the SinGAN/ConSinGAN baselines
    (train_video_baselines.py:55-70): body[:-train_depth] frozen, head only
    while scale_idx-train_depth<0, tail always at lr_g."""
    body = ["frozen"] * n_body
    lrs: Dict[str, float] = {}
    depth = min(cfg.train_depth, n_body)
    for j, idx in enumerate(range(n_body - depth, n_body)):
        body[idx] = f"b{j}"
        lrs[f"b{j}"] = cfg.lr_g * (cfg.lr_scale ** (depth - 1 - j))

    modules: Dict[str, str] = {}
    if has_head:
        if scale_idx - cfg.train_depth < 0:
            modules["head"] = "head"
            lrs["head"] = cfg.lr_g * (cfg.lr_scale ** scale_idx)
        else:
            modules["head"] = "frozen"
        modules["tail"] = "tail"
        lrs["tail"] = cfg.lr_g
    return modules, body, lrs


def _label_tree(params_view: Dict[str, Any], module_labels: Dict[str, str],
                body_labels: List[str]):
    """Broadcast group labels over every leaf of each subtree."""
    labels: Dict[str, Any] = {}
    for key, sub in params_view.items():
        if key == "body":
            labels["body"] = [
                jax.tree_util.tree_map(lambda _, lab=lab: lab, stage)
                for stage, lab in zip(sub, body_labels)]
        else:
            lab = module_labels.get(key, "frozen")
            labels[key] = jax.tree_util.tree_map(lambda _, lab=lab: lab, sub)
    return labels


def trainable_split(params_view: Dict[str, Any],
                    module_labels: Dict[str, str], body_labels: List[str]
                    ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Split the params view into (trainable, frozen) subtrees by group
    label.  Used by the --fast-grads path: differentiating only the
    trainable subtree lets XLA dead-code-eliminate the backward through
    frozen stages (the reference backprops through everything and zeroes
    later — train_video.py:199-202)."""
    trainable: Dict[str, Any] = {}
    frozen: Dict[str, Any] = {}
    for key, sub in params_view.items():
        if key == "body":
            trainable["body"] = {}
            frozen["body"] = {}
            for i, (stage, lab) in enumerate(zip(sub, body_labels)):
                (frozen if lab == "frozen" else trainable)["body"][i] = stage
        else:
            lab = module_labels.get(key, "frozen")
            (frozen if lab == "frozen" else trainable)[key] = sub
    return trainable, frozen


def trainable_merge(params_view_template: Dict[str, Any],
                    trainable: Dict[str, Any], frozen: Dict[str, Any]
                    ) -> Dict[str, Any]:
    """Inverse of trainable_split (template fixes body ordering/length)."""
    out: Dict[str, Any] = {}
    for key, sub in params_view_template.items():
        if key == "body":
            body = []
            for i in range(len(sub)):
                if i in trainable.get("body", {}):
                    body.append(trainable["body"][i])
                else:
                    body.append(frozen["body"][i])
            out["body"] = body
        else:
            out[key] = trainable.get(key, frozen.get(key))
    return out


def scatter_grads(params_view_template: Dict[str, Any],
                  trainable_grads: Dict[str, Any]) -> Dict[str, Any]:
    """Expand trainable-subtree grads to the full params structure with
    zeros for frozen leaves (what the optimizer transform expects)."""
    import jax.numpy as jnp

    def zeros_like_tree(t):
        return jax.tree_util.tree_map(jnp.zeros_like, t)

    out: Dict[str, Any] = {}
    for key, sub in params_view_template.items():
        if key == "body":
            body = []
            for i in range(len(sub)):
                if i in trainable_grads.get("body", {}):
                    body.append(trainable_grads["body"][i])
                else:
                    body.append(zeros_like_tree(sub[i]))
            out["body"] = body
        else:
            out[key] = trainable_grads.get(key, zeros_like_tree(sub))
    return out


def g_transform(cfg, params_view_like: Dict[str, Any],
                module_labels: Dict[str, str], body_labels: List[str],
                lrs: Dict[str, float], grad_clip: Optional[float]
                ) -> optax.GradientTransformation:
    """Generator transform only: [global clip ->] grouped Adam.

    ``params_view_like`` may hold abstract leaves (ShapeDtypeStructs) — only
    the tree STRUCTURE shapes the label tree, so the compile-ahead thread
    (train/precompile.py) can build the next scale's transform without
    allocating its parameters."""
    transforms = {lab: optax.adam(lr, b1=cfg.beta1, b2=0.999)
                  for lab, lr in lrs.items()}
    transforms["frozen"] = optax.set_to_zero()
    labels = _label_tree(params_view_like, module_labels, body_labels)
    tx = optax.multi_transform(transforms, labels)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def build_g_optimizer(cfg, params_view: Dict[str, Any],
                      module_labels: Dict[str, str], body_labels: List[str],
                      lrs: Dict[str, float], grad_clip: Optional[float]
                      ) -> Tuple[optax.GradientTransformation, Any]:
    """Fresh per-scale generator optimizer: [global clip ->] grouped Adam."""
    tx = g_transform(cfg, params_view, module_labels, body_labels, lrs,
                     grad_clip)
    return tx, tx.init(params_view)


def d_transform(cfg) -> optax.GradientTransformation:
    return optax.adam(cfg.lr_d, b1=cfg.beta1, b2=0.999)


def build_d_optimizer(cfg, dparams: Dict[str, Any]
                      ) -> Tuple[optax.GradientTransformation, Any]:
    tx = d_transform(cfg)
    return tx, tx.init(dparams)
