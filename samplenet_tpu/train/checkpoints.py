"""Checkpointing via orbax with explicit partial-subtree restore.

The reference leans on partial-scope restores everywhere: classifier-vars-only
saver (classification/train_samplenet.py:202-207), per-clone restore_into_scope
(train_samplenet_progressive.py:469-486), AE-subscope restore
(reconstruction/src/sampler_autoencoder.py:59-71), torch snap_best/snap_last
(registration/main.py:201-218). Here a checkpoint is just a pytree dict; a
"partial restore" is reading one checkpoint's tree and grafting it into
another model's param tree — plain dict surgery, no graph scopes needed.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def save(path: str, tree: Any, *, force: bool = True) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=force)


def restore(path: str, template: Any | None = None) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if template is None:
        return ckptr.restore(path)
    return ckptr.restore(path, args=ocp.args.PyTreeRestore(template))


def restore_subtree(path: str, key: str) -> Any:
    """Load one top-level subtree (e.g. 'params') from a checkpoint."""
    return restore(path)[key]


def graft(target_params: dict, source_params: dict, at: str) -> dict:
    """Return target_params with target_params[at] replaced by source_params.

    Mirrors restore_into_scope semantics: weights trained under one scope
    placed under another module's subtree.
    """
    out = dict(target_params)
    if at not in out:
        raise KeyError(f"no subtree {at!r} in target params "
                       f"(have {list(out.keys())})")
    out[at] = source_params
    return out


def save_sharded(path: str, tree: Any, *, force: bool = True) -> None:
    """Multi-process-safe save of a pytree of (possibly) globally-sharded
    jax.Arrays: EVERY process must call this; orbax writes each array's
    shards from the host that owns them — no device_get host gather, so it
    scales to arrays larger than one host's memory (the multi-host story
    the reference never had, SURVEY.md section 2c)."""
    ocp.PyTreeCheckpointer().save(os.path.abspath(path), tree, force=force)


def restore_sharded(path: str, target: Any) -> Any:
    """Restore a sharded checkpoint onto the shardings of `target` — a
    pytree of jax.Arrays or ShapeDtypeStructs carrying `.sharding`. The
    target mesh may have a DIFFERENT shape or process count than the mesh
    the checkpoint was saved from; orbax reshards on read."""
    import jax

    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=x.sharding),
        target)
    restore_args = ocp.checkpoint_utils.construct_restore_args(abstract)
    return ocp.PyTreeCheckpointer().restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(abstract, restore_args=restore_args))


def save_train_state(path: str, state, *, extras: dict | None = None) -> None:
    """Full training snapshot: params, batch_stats, opt_state, step
    (the torch snap_best/snap_last contract, registration/main.py:201-218)."""
    import jax

    tree = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": jax.device_get(state.step),
    }
    save(path, tree)
    # extras ride as JSON beside the tree — arbitrary keys would otherwise
    # break orbax's strict template matching on restore
    import json

    with open(os.path.join(os.path.abspath(path), "extras.json"), "w") as f:
        json.dump(extras or {}, f, default=float)


def restore_train_state(path: str, state_template):
    """Restore a snapshot into a freshly-created TrainState of the same
    model/optimizer (template supplies the tree structure)."""
    import jax

    template = {
        "params": jax.device_get(state_template.params),
        "batch_stats": jax.device_get(state_template.batch_stats),
        "opt_state": jax.device_get(state_template.opt_state),
        "step": jax.device_get(state_template.step),
    }
    tree = restore(path, template)
    state = state_template.replace(
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
        step=tree["step"],
    )
    import json

    extras_path = os.path.join(os.path.abspath(path), "extras.json")
    extras = {}
    if os.path.exists(extras_path):
        with open(extras_path) as f:
            extras = json.load(f)
    return state, extras
