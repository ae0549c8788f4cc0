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
