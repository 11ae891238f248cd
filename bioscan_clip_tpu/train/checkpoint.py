"""Checkpointing: orbax full-train-state save/restore + torch .pth import.

Upgrades over the reference (SURVEY.md §5.4): the reference saves only
`model.state_dict()` to last.pth/best.pth (train_cl.py:217-238) with no
optimizer/step state and no mid-run resume. Here:

- `save_checkpoint` / `restore_checkpoint`: orbax, full state (params + opt
  state + step), async-capable, with `last`/`best` names matching the
  reference's artifact layout.
- `load_pth_into_params`: load a released SimpleCLIP .pth into a param tree
  (best.pth -> last.pth fallback mirrors inference_and_eval.py:789-792).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(directory: str, state, name: str = "last"):
    """Save params/opt_state/step under <directory>/<name>."""
    path = os.path.join(_ckpt_dir(directory), name)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(directory: str, state, name: str = "last", mesh=None):
    """Restore into an existing (abstract or concrete) TrainState.

    If `mesh` is given, restored arrays are re-placed replicated over it
    (orbax restores committed to a single device, which would conflict with
    mesh-sharded batches in the jitted step).
    """
    path = os.path.join(_ckpt_dir(directory), name)
    ckptr = ocp.StandardCheckpointer()
    target = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    restored = ckptr.restore(path, target)
    if mesh is not None:
        from bioscan_clip_tpu.parallel.mesh import replicated

        restored = jax.device_put(restored, replicated(mesh))
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
    )


def save_params_only(directory: str, params, name: str = "params"):
    path = os.path.join(_ckpt_dir(directory), name)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def restore_params_only(directory: str, params_like, name: str = "params"):
    path = os.path.join(_ckpt_dir(directory), name)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, params_like)


def resolve_reference_ckpt(folder: str) -> Optional[str]:
    """best.pth with last.pth fallback (inference_and_eval.py:789-792)."""
    best = os.path.join(folder, "best.pth")
    last = os.path.join(folder, "last.pth")
    if os.path.isfile(best):
        return best
    if os.path.isfile(last):
        return last
    return None


def load_pth_into_params(pth_path: str, init_params, output_dim: int = 768):
    """Load a released SimpleCLIP .pth checkpoint into a MultiModalCLIP
    param tree (converted tower weights overlay the init tree)."""
    from bioscan_clip_tpu.interop.torch_import import (
        convert_simple_clip_checkpoint,
        load_torch_state_dict,
        merge_params,
    )

    sd = load_torch_state_dict(pth_path)
    conv = convert_simple_clip_checkpoint(sd, output_dim=output_dim)
    return merge_params(init_params, conv)


def load_pretrained_towers(
    args, init_params, output_dim: int = 768
) -> Any:
    """Load the three *pretrained* towers (BarcodeBERT ckpt; timm/HF when
    available on disk) into a fresh param tree — the reference's
    from-pretrained initialization (simple_clip.py:147-191)."""
    from bioscan_clip_tpu.interop.torch_import import (
        convert_barcode_bert,
        load_torch_state_dict,
        merge_params,
    )

    params = init_params
    ckpt = getattr(args, "bioscan_bert_checkpoint", None)
    if ckpt and os.path.isfile(ckpt) and "dna_encoder" in params:
        sd = load_torch_state_dict(ckpt)
        params = merge_params(
            params, {"dna_encoder": convert_barcode_bert(sd, num_layers=12)}
        )
    return params
