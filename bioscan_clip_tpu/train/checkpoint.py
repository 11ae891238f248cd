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
import shutil
import threading
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(path: str) -> str:
    return os.path.abspath(path)


# In-flight async saves by target path (block=False); joined by
# wait_for_checkpoints() and by any new save to the same path. The reference
# has no async saving at all (train_cl.py:217-238 blocks on torch.save).
_PENDING: dict = {}


def save_checkpoint(directory: str, state, name: str = "last",
                    block: bool = True):
    """Save params/opt_state/step under <directory>/<name>.

    `block=False` returns as soon as the device arrays are snapshotted and
    writes in a background thread (orbax async) — the train loop keeps
    stepping during the disk write. Call `wait_for_checkpoints()` before
    reading the files or exiting.

    Durability: the write lands in `<name>.writing` and is swapped into
    `<name>` only once complete, so the previous checkpoint stays valid for
    the whole (potentially eval-phase-long) async window; two saves to the
    same name serialize (the second joins the first before starting)."""
    path = os.path.join(_ckpt_dir(directory), name)
    prev = _PENDING.pop(path, None)
    if prev is not None:
        prev.join()
    payload = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    if jax.process_count() > 1:
        # multi-host: the train state is replicated, so snapshot to host
        # (addressable everywhere) and let process 0 be the single writer
        import numpy as np

        payload = jax.tree.map(lambda x: np.asarray(x), payload)
        if jax.process_index() != 0:
            return path
    tmp = path + ".writing"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp, payload, force=True)

    def _finalize():
        ckptr.wait_until_finished()
        old = path + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.isdir(old):
            shutil.rmtree(old)

    if block:
        _finalize()
    else:
        t = threading.Thread(target=_finalize, daemon=True)
        t.start()
        _PENDING[path] = t
    return path


def wait_for_checkpoints():
    """Join all pending async saves (no-op if none)."""
    while _PENDING:
        _PENDING.popitem()[1].join()


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
        from bioscan_clip_tpu.parallel.mesh import replicate_for_mesh

        restored = replicate_for_mesh(restored, mesh)
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


def _load_hf_bert_state_dict(path_or_name: str) -> Optional[dict]:
    """State dict for an HF BERT from a local artifact.

    Accepts: a .pth/.bin file (torch.load), a local HF model directory
    (pytorch_model.bin inside), or an HF model name resolvable from the
    *local* cache (`local_files_only=True` — this host has zero egress).
    """
    from bioscan_clip_tpu.interop.torch_import import load_torch_state_dict

    if os.path.isfile(path_or_name):
        return load_torch_state_dict(path_or_name)
    if os.path.isdir(path_or_name):
        for fname in ("pytorch_model.bin", "model.pth", "model.bin"):
            p = os.path.join(path_or_name, fname)
            if os.path.isfile(p):
                return load_torch_state_dict(p)
    try:
        from transformers import BertModel

        model = BertModel.from_pretrained(path_or_name, local_files_only=True)
        return {
            k: v.detach().cpu().numpy() for k, v in model.state_dict().items()
        }
    except Exception:
        return None


def load_pretrained_towers(
    args, init_params, output_dim: int = 768, log=None
) -> Any:
    """Load the pretrained towers into a fresh param tree — the reference's
    from-pretrained initialization (simple_clip.py:147-191):

    - DNA:   BarcodeBERT MLM ckpt at `args.bioscan_bert_checkpoint`
             (dna_encoder.py:14-22; MLM decoder discarded).
    - image: timm `vit_base_patch16_224` state dict at
             `args.pretrained_weights.timm_vit` (simple_clip.py:150; the
             1000-class head is dropped, head_out stays fresh).
    - text:  `prajjwal1/bert-small` weights at
             `args.pretrained_weights.bert_small` — a .pth/.bin file, an HF
             model dir, or a cached HF name (language_encoder.py:12-20).
    - OpenCLIP ablation: full open_clip ViT-L/14 state dict at
             `args.pretrained_weights.open_clip` feeding both towers
             (simple_clip.py:141-145).

    Tower type is detected from the init tree structure; layer counts are
    derived from the stacked scan leaves. Missing artifacts leave that tower
    at its random init (logged via `log`).
    """
    from bioscan_clip_tpu.interop.torch_import import (
        convert_barcode_bert,
        convert_bert_encoder,
        convert_timm_vit,
        load_torch_state_dict,
        merge_params,
    )

    def _say(msg):
        if log:
            log(msg)

    pw = getattr(args, "pretrained_weights", None)

    def _pw(key):
        p = getattr(pw, key, None) if pw is not None else None
        return p if p and (os.path.isfile(str(p)) or os.path.isdir(str(p))) \
            else None

    params = init_params

    dna = params.get("dna_encoder")
    ckpt = getattr(args, "bioscan_bert_checkpoint", None)
    if dna is not None and "bert" in dna and ckpt and os.path.isfile(ckpt):
        sd = load_torch_state_dict(ckpt)
        nl = int(dna["bert"]["layers"]["query"]["kernel"].shape[0])
        params = merge_params(
            params, {"dna_encoder": convert_barcode_bert(sd, num_layers=nl)}
        )
        _say(f"dna_encoder <- BarcodeBERT {ckpt}")

    img = params.get("image_encoder")
    if img is not None and "blocks" in img:
        path = _pw("timm_vit")
        if path:
            sd = load_torch_state_dict(path)
            nl = int(img["blocks"]["qkv"]["kernel"].shape[0])
            params = merge_params(
                params,
                {"image_encoder": convert_timm_vit(
                    sd, num_layers=nl, head_out=output_dim
                )},
            )
            _say(f"image_encoder <- timm ViT {path}")
        else:
            _say("image_encoder: no timm_vit artifact; random init")

    txt = params.get("language_encoder")
    if txt is not None and "bert" in txt:
        src = None
        if pw is not None and getattr(pw, "bert_small", None):
            src = _load_hf_bert_state_dict(str(pw.bert_small))
        if src is None:
            src = _load_hf_bert_state_dict("prajjwal1/bert-small")
        if src is not None:
            nl = int(txt["bert"]["layers"]["query"]["kernel"].shape[0])
            params = merge_params(
                params,
                {"language_encoder": {
                    "bert": convert_bert_encoder(src, num_layers=nl)
                }},
            )
            _say("language_encoder <- bert-small weights")
        else:
            _say("language_encoder: no bert-small artifact; random init")

    # OpenCLIP ablation path: one .pt feeds both towers
    oc_path = _pw("open_clip")
    is_oc_img = img is not None and "resblocks" in img
    is_oc_txt = txt is not None and "text" in txt
    if (is_oc_img or is_oc_txt) and oc_path:
        from bioscan_clip_tpu.models.openclip import (
            convert_openclip_text,
            convert_openclip_visual,
        )

        sd = load_torch_state_dict(oc_path)
        overlay = {}
        if is_oc_img:
            nl = int(img["resblocks"]["in_proj"]["kernel"].shape[0])
            overlay["image_encoder"] = convert_openclip_visual(sd, layers=nl)
        if is_oc_txt:
            nl = int(txt["text"]["resblocks"]["in_proj"]["kernel"].shape[0])
            overlay["language_encoder"] = {
                "text": convert_openclip_text(sd, layers=nl)
            }
        params = merge_params(params, overlay)
        _say(f"open_clip towers <- {oc_path}")
    elif is_oc_img or is_oc_txt:
        _say("open_clip towers: no artifact; random init")

    return params
