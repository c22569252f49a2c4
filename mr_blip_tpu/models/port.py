"""Weight porting: PyTorch checkpoints -> mr_blip_tpu flax param trees.

Covers the reference's three pretrained sources (blip2_mr.py:1466-1495 +
blip2.py:86-104 + eva_vit.py:429-436):

* EVA ViT-g (LAVIS ``eva_vit_g.pth`` state dict)        -> ``visual_encoder``
* BLIP-2 stage-2 checkpoint (query_tokens, Qformer.*,
  t5_proj, ln_vision)                                    -> ``qformer``/...
* HF Flan-T5 (``model.state_dict()`` or safetensors)     -> ``t5``
* PEFT LoRA adapters (``lora_A``/``lora_B``)             -> ``lora_a``/``lora_b``

All functions take name->numpy dicts, so callers can feed
``torch.load(..., map_location="cpu")`` results directly.  Dense kernels are
transposed torch(out,in) -> flax(in,out); conv kernels OIHW -> HWIO.
"""

from __future__ import annotations

import logging
import re
from typing import Dict

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t)


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def port_eva_vit(state_dict: Dict[str, np.ndarray]) -> dict:
    """LAVIS EVA ViT-g state dict -> EvaViT params subtree."""
    out: dict = {}
    sd = {k: _np(v) for k, v in state_dict.items()}
    _set(out, "cls_token", sd["cls_token"])
    _set(out, "pos_embed", sd["pos_embed"])
    _set(out, "patch_embed/kernel", sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    _set(out, "patch_embed/bias", sd["patch_embed.proj.bias"])

    n_blocks = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"blocks\.(\d+)\.", k))
    )
    for i in range(n_blocks):
        p = f"blocks.{i}."
        b = f"blocks_{i}/"
        _set(out, b + "norm1/LayerNorm_0/scale", sd[p + "norm1.weight"])
        _set(out, b + "norm1/LayerNorm_0/bias", sd[p + "norm1.bias"])
        _set(out, b + "attn/qkv/Dense_0/kernel", sd[p + "attn.qkv.weight"].T)
        _set(out, b + "attn/q_bias", sd[p + "attn.q_bias"])
        _set(out, b + "attn/v_bias", sd[p + "attn.v_bias"])
        _set(out, b + "attn/proj/Dense_0/kernel", sd[p + "attn.proj.weight"].T)
        _set(out, b + "attn/proj/Dense_0/bias", sd[p + "attn.proj.bias"])
        _set(out, b + "norm2/LayerNorm_0/scale", sd[p + "norm2.weight"])
        _set(out, b + "norm2/LayerNorm_0/bias", sd[p + "norm2.bias"])
        _set(out, b + "mlp/fc1/Dense_0/kernel", sd[p + "mlp.fc1.weight"].T)
        _set(out, b + "mlp/fc1/Dense_0/bias", sd[p + "mlp.fc1.bias"])
        _set(out, b + "mlp/fc2/Dense_0/kernel", sd[p + "mlp.fc2.weight"].T)
        _set(out, b + "mlp/fc2/Dense_0/bias", sd[p + "mlp.fc2.bias"])
    return out


def port_qformer(state_dict: Dict[str, np.ndarray], prefix: str = "Qformer.") -> dict:
    """BLIP-2 Q-Former (text path stripped) -> QFormer params subtree.

    Input keys follow the reference Qformer module naming
    (``Qformer.bert.encoder.layer.{i}.attention...``); returns the params
    subtree including ``query_tokens``.
    """
    out: dict = {}
    sd = {k: _np(v) for k, v in state_dict.items() if k.startswith(prefix) or k == "query_tokens"}
    if "query_tokens" in sd:
        _set(out, "query_tokens", sd["query_tokens"])

    emb = prefix + "bert.embeddings."
    if emb + "LayerNorm.weight" in sd:
        _set(out, "embeddings_norm/LayerNorm_0/scale", sd[emb + "LayerNorm.weight"])
        _set(out, "embeddings_norm/LayerNorm_0/bias", sd[emb + "LayerNorm.bias"])

    layer_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(re.escape(prefix) + r"bert\.encoder\.layer\.(\d+)\.", k))
        }
    )
    for i in layer_ids:
        p = f"{prefix}bert.encoder.layer.{i}."
        b = f"layer_{i}/"

        def attn(src, dst):
            _set(out, b + dst + "/query/Dense_0/kernel", sd[p + src + ".self.query.weight"].T)
            _set(out, b + dst + "/query/Dense_0/bias", sd[p + src + ".self.query.bias"])
            _set(out, b + dst + "/key/Dense_0/kernel", sd[p + src + ".self.key.weight"].T)
            _set(out, b + dst + "/key/Dense_0/bias", sd[p + src + ".self.key.bias"])
            _set(out, b + dst + "/value/Dense_0/kernel", sd[p + src + ".self.value.weight"].T)
            _set(out, b + dst + "/value/Dense_0/bias", sd[p + src + ".self.value.bias"])
            _set(out, b + dst + "/output/Dense_0/kernel", sd[p + src + ".output.dense.weight"].T)
            _set(out, b + dst + "/output/Dense_0/bias", sd[p + src + ".output.dense.bias"])
            _set(out, b + dst + "/output_norm/LayerNorm_0/scale", sd[p + src + ".output.LayerNorm.weight"])
            _set(out, b + dst + "/output_norm/LayerNorm_0/bias", sd[p + src + ".output.LayerNorm.bias"])

        attn("attention", "self_attention")
        if p + "crossattention.self.query.weight" in sd:
            attn("crossattention", "cross_attention")

        _set(out, b + "intermediate_query/Dense_0/kernel", sd[p + "intermediate_query.dense.weight"].T)
        _set(out, b + "intermediate_query/Dense_0/bias", sd[p + "intermediate_query.dense.bias"])
        _set(out, b + "output_query/Dense_0/kernel", sd[p + "output_query.dense.weight"].T)
        _set(out, b + "output_query/Dense_0/bias", sd[p + "output_query.dense.bias"])
        _set(out, b + "output_query_norm/LayerNorm_0/scale", sd[p + "output_query.LayerNorm.weight"])
        _set(out, b + "output_query_norm/LayerNorm_0/bias", sd[p + "output_query.LayerNorm.bias"])
    return out


def port_t5_hf(state_dict: Dict[str, np.ndarray]) -> dict:
    """HF ``T5ForConditionalGeneration`` state dict -> T5 params subtree."""
    out: dict = {}
    sd = {k: _np(v) for k, v in state_dict.items()}
    _set(out, "shared/embedding", sd["shared.weight"])
    if "lm_head.weight" in sd:
        _set(out, "lm_head/Dense_0/kernel", sd["lm_head.weight"].T)

    def port_stack(side: str, n_sub: dict):
        blocks = sorted(
            {
                int(m.group(1))
                for k in sd
                if (m := re.match(rf"{side}\.block\.(\d+)\.", k))
            }
        )
        for i in blocks:
            p = f"{side}.block.{i}."
            b = f"{side}/block_{i}/"
            # sublayer 0: self attention
            for w in ("q", "k", "v", "o"):
                _set(out, b + f"self_attention/{w}/Dense_0/kernel",
                     sd[p + f"layer.0.SelfAttention.{w}.weight"].T)
            _set(out, b + "self_attn_norm/scale", sd[p + "layer.0.layer_norm.weight"])
            if i == 0:
                _set(out, f"{side}/rel_bias/rel_embedding",
                     sd[p + "layer.0.SelfAttention.relative_attention_bias.weight"])
            li = 1
            if side == "decoder":
                for w in ("q", "k", "v", "o"):
                    _set(out, b + f"cross_attention/{w}/Dense_0/kernel",
                         sd[p + f"layer.1.EncDecAttention.{w}.weight"].T)
                _set(out, b + "cross_attn_norm/scale", sd[p + "layer.1.layer_norm.weight"])
                li = 2
            ff = f"layer.{li}.DenseReluDense."
            if p + ff + "wi_0.weight" in sd:
                _set(out, b + "ff/wi_0/Dense_0/kernel", sd[p + ff + "wi_0.weight"].T)
                _set(out, b + "ff/wi_1/Dense_0/kernel", sd[p + ff + "wi_1.weight"].T)
            else:
                _set(out, b + "ff/wi/Dense_0/kernel", sd[p + ff + "wi.weight"].T)
            _set(out, b + "ff/wo/Dense_0/kernel", sd[p + ff + "wo.weight"].T)
            _set(out, b + "ff_norm/scale", sd[p + f"layer.{li}.layer_norm.weight"])
        _set(out, f"{side}/final_norm/scale", sd[f"{side}.final_layer_norm.weight"])

    port_stack("encoder", {})
    port_stack("decoder", {})
    return out


def port_opt_hf(state_dict: Dict[str, np.ndarray]) -> dict:
    """HF ``OPTForCausalLM`` state dict -> OPT params subtree.

    Covers the OPT-2.7b/6.7b layout used by the reference's vendored stack
    (``modeling_opt.py``): decoder embeddings (position table includes the
    offset-2 rows), per-layer pre-LNs, q/k/v/out projections, ReLU FFN, and
    the top-level final LayerNorm. The LM head is tied to the token
    embedding in both frameworks, so ``lm_head.weight`` is skipped.
    """
    out: dict = {}
    sd = {k: _np(v) for k, v in state_dict.items()}
    pre = "model.decoder."
    _set(out, "embed_tokens/embedding", sd[pre + "embed_tokens.weight"])
    _set(out, "embed_positions/embedding", sd[pre + "embed_positions.weight"])
    _set(out, "final_norm/LayerNorm_0/scale", sd[pre + "final_layer_norm.weight"])
    _set(out, "final_norm/LayerNorm_0/bias", sd[pre + "final_layer_norm.bias"])
    layers = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(re.escape(pre) + r"layers\.(\d+)\.", k))
        }
    )
    for i in layers:
        p = f"{pre}layers.{i}."
        b = f"layer_{i}/"
        for w in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _set(out, b + f"self_attn/{w}/Dense_0/kernel",
                 sd[p + f"self_attn.{w}.weight"].T)
            _set(out, b + f"self_attn/{w}/Dense_0/bias",
                 sd[p + f"self_attn.{w}.bias"])
        _set(out, b + "self_attn_norm/LayerNorm_0/scale",
             sd[p + "self_attn_layer_norm.weight"])
        _set(out, b + "self_attn_norm/LayerNorm_0/bias",
             sd[p + "self_attn_layer_norm.bias"])
        _set(out, b + "final_norm/LayerNorm_0/scale",
             sd[p + "final_layer_norm.weight"])
        _set(out, b + "final_norm/LayerNorm_0/bias",
             sd[p + "final_layer_norm.bias"])
        for w in ("fc1", "fc2"):
            _set(out, b + f"{w}/Dense_0/kernel", sd[p + f"{w}.weight"].T)
            _set(out, b + f"{w}/Dense_0/bias", sd[p + f"{w}.bias"])
    return out


# HF T5 submodule -> flax module-name fragments (see port_t5_hf).
_T5_LORA_MODULES = {
    "SelfAttention": "self_attention",
    "EncDecAttention": "cross_attention",
    "DenseReluDense": "ff",
}


def _t5_lora_path(hf_path: str) -> str | None:
    """``encoder.block.0.layer.0.SelfAttention.q`` -> ``encoder/block_0/self_attention/q``.

    Returns None for module paths that carry no LoRA in the flax tree.
    """
    if hf_path == "lm_head":
        return "lm_head"
    m = re.match(
        r"(encoder|decoder)\.block\.(\d+)\.layer\.\d+\.(\w+)\.(q|k|v|o|wi|wi_0|wi_1|wo)$",
        hf_path,
    )
    if not m:
        return None
    side, block, module, leaf = m.groups()
    frag = _T5_LORA_MODULES.get(module)
    if frag is None:
        return None
    return f"{side}/block_{block}/{frag}/{leaf}"


def port_lora_peft(state_dict: Dict[str, np.ndarray]) -> dict:
    """PEFT LoRA adapter state dict -> ``lora_a``/``lora_b`` leaves under t5.

    Handles the reference's finetuned-checkpoint layout (peft 0.13 wrapping,
    blip2_mr.py:183-237 + runner_base.py:572-600 trainable-only save): keys
    like ``[t5_model.]base_model.model.encoder.block.0.layer.0.SelfAttention
    .q.lora_A[.default].weight`` — the optional adapter name between
    ``lora_A`` and ``weight`` as well as raw ``adapter_model.bin`` layouts
    (no ``t5_model.`` prefix) both parse. torch stores ``lora_A`` as
    (r, in) and ``lora_B`` as (out, r); flax wants (in, r)/(r, out), so both
    transpose.
    """
    out: dict = {}
    pat = re.compile(
        r"(?:^|\.)((?:encoder|decoder)\.block\.\d+\.layer\.\d+\.\w+\.\w+|lm_head)"
        r"\.lora_(A|B)(?:\.[\w-]+)?\.weight$"
    )
    for k, v in state_dict.items():
        m = pat.search(k)
        if not m:
            continue
        path = _t5_lora_path(m.group(1))
        if path is None:
            logging.warning("port_lora_peft: no flax site for %s", k)
            continue
        leaf = "lora_a" if m.group(2) == "A" else "lora_b"
        _set(out, f"{path}/{leaf}", _np(v).T)
    return out


def port_mr_finetuned(state_dict: Dict[str, np.ndarray]) -> dict:
    """Full reference BLIP2_MR finetuned checkpoint -> framework param tree.

    The reference saves trainable params only (runner_base.py:572-600):
    LoRA adapters under ``t5_model.``/``answerer_model.``, Q-Former
    (unless ``qformer_freeze``), ``t5_proj``, ``query_tokens`` — loaded
    non-strict over the pretrained base (blip2_mr.py:1466-1495). Returns a
    tree rooted at the model level (subtrees: t5, qformer, t5_proj, ...).
    """
    out: dict = {}
    qf = port_qformer(state_dict)  # picks up Qformer.* + query_tokens
    if qf:
        out["qformer"] = qf
    lora = port_lora_peft(
        {k: v for k, v in state_dict.items() if not k.startswith("answerer_model.")}
    )
    if lora:
        out["t5"] = lora
    answerer = port_lora_peft(
        {k: v for k, v in state_dict.items() if k.startswith("answerer_model.")}
    )
    if answerer:
        out["answerer_t5"] = answerer
    if "t5_proj.weight" in state_dict:
        _set(out, "t5_proj/Dense_0/kernel", _np(state_dict["t5_proj.weight"]).T)
        _set(out, "t5_proj/Dense_0/bias", _np(state_dict["t5_proj.bias"]))
    if "ln_vision.weight" in state_dict:
        _set(out, "ln_vision/LayerNorm_0/scale", _np(state_dict["ln_vision.weight"]))
        _set(out, "ln_vision/LayerNorm_0/bias", _np(state_dict["ln_vision.bias"]))
    return out


def merge_subtree(params: dict, subtree: dict, at: str) -> dict:
    """Return params with ``subtree`` grafted at the (possibly nested) key
    path ``at`` (e.g. "t5" or "visual_encoder"); shape-checked, non-strict."""
    from flax import traverse_util

    flat_params = traverse_util.flatten_dict(params, sep="/")
    flat_sub = traverse_util.flatten_dict(subtree, sep="/")
    merged, skipped = 0, []
    for k, v in flat_sub.items():
        full = f"{at}/{k}" if at else k
        if full in flat_params:
            if np.shape(v) != np.shape(flat_params[full]):
                skipped.append((full, np.shape(v), np.shape(flat_params[full])))
                continue
            flat_params[full] = np.asarray(v, dtype=flat_params[full].dtype)
            merged += 1
        else:
            skipped.append((full, np.shape(v), None))
    if skipped:
        logging.warning("port: %d tensors skipped, e.g. %s", len(skipped), skipped[:3])
    logging.info("port: merged %d tensors at %r", merged, at)
    return traverse_util.unflatten_dict(flat_params, sep="/")


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.bin/.safetensors file into a name->numpy dict."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _np(v) for k, v in obj.items()}


def port_med(state_dict: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """Reference MED BertModel state dict -> MedModel params subtree.

    Layout (reference ``lavis/models/med.py``): embeddings.{word,position}
    + LayerNorm; per layer attention.self.{query,key,value} +
    attention.output.{dense,LayerNorm}, optional crossattention.*,
    intermediate.dense, output.{dense,LayerNorm}. The pooler (unused by
    the zoo paths) and position_ids buffers are skipped.
    """
    sd = {k[len(prefix):]: _np(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    out: dict = {}
    _set(out, "word_embeddings/embedding", sd["embeddings.word_embeddings.weight"])
    _set(out, "position_embeddings/embedding",
         sd["embeddings.position_embeddings.weight"])
    _set(out, "embeddings_norm/LayerNorm_0/scale", sd["embeddings.LayerNorm.weight"])
    _set(out, "embeddings_norm/LayerNorm_0/bias", sd["embeddings.LayerNorm.bias"])

    n_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"encoder\.layer\.(\d+)\.", k))
    )

    def dense(src, dst):
        _set(out, dst + "/Dense_0/kernel", sd[src + ".weight"].T)
        if src + ".bias" in sd:
            _set(out, dst + "/Dense_0/bias", sd[src + ".bias"])

    def norm(src, dst):
        _set(out, dst + "/LayerNorm_0/scale", sd[src + ".weight"])
        _set(out, dst + "/LayerNorm_0/bias", sd[src + ".bias"])

    for i in range(n_layers):
        p = f"encoder.layer.{i}."
        b = f"layer_{i}/"
        for name in ("query", "key", "value"):
            dense(p + f"attention.self.{name}", b + f"attention/{name}")
        dense(p + "attention.output.dense", b + "attention/output")
        norm(p + "attention.output.LayerNorm", b + "attention/output_norm")
        if p + "crossattention.self.query.weight" in sd:
            for name in ("query", "key", "value"):
                dense(p + f"crossattention.self.{name}", b + f"crossattention/{name}")
            dense(p + "crossattention.output.dense", b + "crossattention/output")
            norm(p + "crossattention.output.LayerNorm", b + "crossattention/output_norm")
        dense(p + "intermediate.dense", b + "intermediate")
        dense(p + "output.dense", b + "output")
        norm(p + "output.LayerNorm", b + "ffn_norm")
    return out


def port_med_lm_head(state_dict: Dict[str, np.ndarray],
                     prefix: str = "cls.") -> dict:
    """BertLMHeadModel cls head -> MedLMHead params (transform dense +
    LayerNorm + vocab decoder; reference med.py BertOnlyMLMHead)."""
    sd = {k[len(prefix):]: _np(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    out: dict = {}
    _set(out, "transform/Dense_0/kernel",
         sd["predictions.transform.dense.weight"].T)
    _set(out, "transform/Dense_0/bias", sd["predictions.transform.dense.bias"])
    _set(out, "transform_norm/LayerNorm_0/scale",
         sd["predictions.transform.LayerNorm.weight"])
    _set(out, "transform_norm/LayerNorm_0/bias",
         sd["predictions.transform.LayerNorm.bias"])
    _set(out, "decoder/Dense_0/kernel", sd["predictions.decoder.weight"].T)
    bias = sd.get("predictions.decoder.bias", sd.get("predictions.bias"))
    if bias is not None:
        _set(out, "decoder/Dense_0/bias", bias)
    return out


def port_timesformer(state_dict: Dict[str, np.ndarray],
                     prefix: str = "") -> dict:
    """Reference TimeSformer state dict -> our TimeSformer params.

    Layout (reference ``lavis/models/timesformer/vit.py``): patch_embed
    conv, cls_token/pos_embed/time_embed, per block temporal_norm1 /
    temporal_attn(qkv,proj) / temporal_fc / norm1 / attn / norm2 / mlp,
    final norm. NOTE the reference keeps tokens patch-major ``(h w t)``
    while ours are frame-major ``(t p)`` — weights are identical (both
    attentions operate on the same token groups); only activation token
    ORDER differs between the two models.
    """
    sd = {k[len(prefix):]: _np(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    out: dict = {}
    _set(out, "cls_token", sd["cls_token"])
    _set(out, "pos_embed", sd["pos_embed"])
    if "time_embed" in sd:
        _set(out, "time_embed", sd["time_embed"])
    _set(out, "patch_embed/kernel",
         sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    _set(out, "patch_embed/bias", sd["patch_embed.proj.bias"])
    _set(out, "norm/LayerNorm_0/scale", sd["norm.weight"])
    _set(out, "norm/LayerNorm_0/bias", sd["norm.bias"])

    block_ids = [
        int(m.group(1))
        for k in sd
        if (m := re.match(r"blocks\.(\d+)\.", k))
    ]
    n_blocks = 1 + max(block_ids) if block_ids else 0

    def dense(src, dst):
        _set(out, dst + "/Dense_0/kernel", sd[src + ".weight"].T)
        if src + ".bias" in sd:
            _set(out, dst + "/Dense_0/bias", sd[src + ".bias"])

    def norm(src, dst):
        _set(out, dst + "/LayerNorm_0/scale", sd[src + ".weight"])
        _set(out, dst + "/LayerNorm_0/bias", sd[src + ".bias"])

    for i in range(n_blocks):
        p = f"blocks.{i}."
        b = f"blocks_{i}/"
        norm(p + "norm1", b + "norm1")
        dense(p + "attn.qkv", b + "attn/qkv")
        dense(p + "attn.proj", b + "attn/proj")
        if p + "temporal_norm1.weight" in sd:
            norm(p + "temporal_norm1", b + "temporal_norm")
            dense(p + "temporal_attn.qkv", b + "temporal_attn/qkv")
            dense(p + "temporal_attn.proj", b + "temporal_attn/proj")
            dense(p + "temporal_fc", b + "temporal_fc")
        norm(p + "norm2", b + "norm2")
        dense(p + "mlp.fc1", b + "mlp/fc1")
        dense(p + "mlp.fc2", b + "mlp/fc2")
    return out


def port_clip(state_dict: Dict[str, np.ndarray]) -> dict:
    """OpenAI/OpenCLIP CLIP state dict -> our CLIP params.

    Layout (reference ``lavis/models/clip_models/model.py`` CLIP /
    VisualTransformer): visual.conv1 (no bias — our conv's bias stays
    zero), class/positional embeddings, ln_pre, resblocks with packed
    in_proj MultiheadAttention + c_fc/c_proj MLPs, ln_post + proj; text
    token/positional embeddings, resblocks, ln_final, text_projection,
    logit_scale. The two projection matrices apply as ``x @ W`` so they
    map to Dense kernels WITHOUT transposition.

    ModifiedResNet checkpoints (RN50 family, ``model.py:156-244``) are
    detected by their ``visual.layer1.*`` keys: convs transpose
    OIHW -> HWIO, BatchNorm running stats port into the params tree
    (models/clip_resnet.py), attnpool projections port as Dense.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    out: dict = {}

    def dense(src_w, dst, src_b=None, transpose=True):
        w = sd[src_w]
        _set(out, dst + "/Dense_0/kernel", w.T if transpose else w)
        if src_b is not None and src_b in sd:
            _set(out, dst + "/Dense_0/bias", sd[src_b])

    def norm(src, dst):
        _set(out, dst + "/LayerNorm_0/scale", sd[src + ".weight"])
        _set(out, dst + "/LayerNorm_0/bias", sd[src + ".bias"])

    def bn(src, dst):
        """torch BatchNorm2d -> our BatchNorm2d (running stats as params)."""
        _set(out, dst + "/scale", sd[src + ".weight"])
        _set(out, dst + "/bias", sd[src + ".bias"])
        _set(out, dst + "/mean", sd[src + ".running_mean"])
        _set(out, dst + "/var", sd[src + ".running_var"])

    def conv(src, dst):
        _set(out, dst + "/kernel", sd[src + ".weight"].transpose(2, 3, 1, 0))

    # ------------------------------------------------------------- visual
    if "visual.layer1.0.conv1.weight" in sd:
        # ModifiedResNet tower (reference model.py:156-244)
        for j in (1, 2, 3):
            conv(f"visual.conv{j}", f"visual/conv{j}")
            bn(f"visual.bn{j}", f"visual/bn{j}")
        for li in range(1, 5):
            n_blocks = 1 + max(
                int(m.group(1)) for k in sd
                if (m := re.match(rf"visual\.layer{li}\.(\d+)\.", k))
            )
            for bi in range(n_blocks):
                p = f"visual.layer{li}.{bi}."
                d = f"visual/layer{li}_block{bi}/"
                for j in (1, 2, 3):
                    conv(p + f"conv{j}", d + f"conv{j}")
                    bn(p + f"bn{j}", d + f"bn{j}")
                if p + "downsample.0.weight" in sd:
                    conv(p + "downsample.0", d + "ds_conv")
                    bn(p + "downsample.1", d + "ds_bn")
        _set(out, "visual/attnpool/pos_embed",
             sd["visual.attnpool.positional_embedding"])
        for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
            dense(f"visual.attnpool.{proj}.weight",
                  f"visual/attnpool/{proj}",
                  f"visual.attnpool.{proj}.bias")
    else:
        _set(out, "visual/patch_embed/kernel",
             sd["visual.conv1.weight"].transpose(2, 3, 1, 0))
        _set(out, "visual/patch_embed/bias",
             np.zeros(sd["visual.conv1.weight"].shape[0], np.float32))
        _set(out, "visual/cls_token", sd["visual.class_embedding"][None, None])
        _set(out, "visual/pos_embed", sd["visual.positional_embedding"][None])
        norm("visual.ln_pre", "visual/ln_pre")
        norm("visual.ln_post", "visual/norm")
        _set(out, "visual_proj/Dense_0/kernel", sd["visual.proj"])  # x @ W

        n_v = 1 + max(
            int(m.group(1)) for k in sd
            if (m := re.match(r"visual\.transformer\.resblocks\.(\d+)\.", k))
        )
        for i in range(n_v):
            p = f"visual.transformer.resblocks.{i}."
            b = f"visual/blocks_{i}/"
            norm(p + "ln_1", b + "norm1")
            dense(p + "attn.in_proj_weight", b + "attn/qkv",
                  p + "attn.in_proj_bias")
            dense(p + "attn.out_proj.weight", b + "attn/proj",
                  p + "attn.out_proj.bias")
            norm(p + "ln_2", b + "norm2")
            dense(p + "mlp.c_fc.weight", b + "mlp/fc1", p + "mlp.c_fc.bias")
            dense(p + "mlp.c_proj.weight", b + "mlp/fc2", p + "mlp.c_proj.bias")

    # --------------------------------------------------------------- text
    _set(out, "token_embedding/embedding", sd["token_embedding.weight"])
    _set(out, "positional_embedding", sd["positional_embedding"])
    norm("ln_final", "ln_final")
    _set(out, "text_proj/Dense_0/kernel", sd["text_projection"])  # x @ W
    _set(out, "logit_scale", sd["logit_scale"])

    n_t = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"transformer\.resblocks\.(\d+)\.", k))
    )
    for i in range(n_t):
        p = f"transformer.resblocks.{i}."
        b = f"text_block_{i}/"
        norm(p + "ln_1", b + "ln_1")
        dense(p + "attn.in_proj_weight", b + "attn_qkv",
              p + "attn.in_proj_bias")
        dense(p + "attn.out_proj.weight", b + "attn_out",
              p + "attn.out_proj.bias")
        norm(p + "ln_2", b + "ln_2")
        dense(p + "mlp.c_fc.weight", b + "mlp/fc1", p + "mlp.c_fc.bias")
        dense(p + "mlp.c_proj.weight", b + "mlp/fc2", p + "mlp.c_proj.bias")
    return out


def port_base_vit(state_dict: Dict[str, np.ndarray],
                  prefix: str = "") -> dict:
    """Reference base ViT (``lavis/models/vit.py``, timm-style, used by
    ALBEF/BLIP-v1) state dict -> our VisionTransformer params. Standard
    fused QKV with a full bias (unlike EVA's q/v-only split)."""
    sd = {k[len(prefix):]: _np(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    out: dict = {}
    _set(out, "cls_token", sd["cls_token"])
    _set(out, "pos_embed", sd["pos_embed"])
    _set(out, "patch_embed/kernel",
         sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    _set(out, "patch_embed/bias", sd["patch_embed.proj.bias"])
    _set(out, "norm/LayerNorm_0/scale", sd["norm.weight"])
    _set(out, "norm/LayerNorm_0/bias", sd["norm.bias"])

    n_blocks = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"blocks\.(\d+)\.", k))
    )

    def dense(src, dst):
        _set(out, dst + "/Dense_0/kernel", sd[src + ".weight"].T)
        if src + ".bias" in sd:
            _set(out, dst + "/Dense_0/bias", sd[src + ".bias"])

    def norm(src, dst):
        _set(out, dst + "/LayerNorm_0/scale", sd[src + ".weight"])
        _set(out, dst + "/LayerNorm_0/bias", sd[src + ".bias"])

    for i in range(n_blocks):
        p = f"blocks.{i}."
        b = f"blocks_{i}/"
        norm(p + "norm1", b + "norm1")
        dense(p + "attn.qkv", b + "attn/qkv")
        dense(p + "attn.proj", b + "attn/proj")
        norm(p + "norm2", b + "norm2")
        dense(p + "mlp.fc1", b + "mlp/fc1")
        dense(p + "mlp.fc2", b + "mlp/fc2")
    return out


def port_gpt2(state_dict: Dict[str, np.ndarray],
              prefix: str = "transformer.") -> dict:
    """HF GPT-2 state dict -> the GPTDialogue LM (OPT-stack-with-GELU)
    params (reference ``lavis/models/gpt_models/gpt_dialogue.py`` is a
    GPT2LMHeadModel subclass).

    GPT-2 stores Linears as Conv1D — weights are (in, out) and map to our
    kernels WITHOUT transposition; c_attn packs q/k/v along the output
    axis. The LM head is tied to wte (OPTConfig.tie_head).
    """
    sd = {k[len(prefix):]: _np(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    out: dict = {}
    _set(out, "embed_tokens/embedding", sd["wte.weight"])
    _set(out, "embed_positions/embedding", sd["wpe.weight"])
    _set(out, "final_norm/LayerNorm_0/scale", sd["ln_f.weight"])
    _set(out, "final_norm/LayerNorm_0/bias", sd["ln_f.bias"])

    n_layers = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"h\.(\d+)\.", k))
    )

    def norm(src, dst):
        _set(out, dst + "/LayerNorm_0/scale", sd[src + ".weight"])
        _set(out, dst + "/LayerNorm_0/bias", sd[src + ".bias"])

    for i in range(n_layers):
        p = f"h.{i}."
        b = f"layer_{i}/"
        norm(p + "ln_1", b + "self_attn_norm")
        w = sd[p + "attn.c_attn.weight"]      # (D, 3D), already (in, out)
        bias = sd[p + "attn.c_attn.bias"]
        d = w.shape[0]
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            _set(out, b + f"self_attn/{name}/Dense_0/kernel",
                 w[:, j * d:(j + 1) * d])
            _set(out, b + f"self_attn/{name}/Dense_0/bias",
                 bias[j * d:(j + 1) * d])
        _set(out, b + "self_attn/out_proj/Dense_0/kernel",
             sd[p + "attn.c_proj.weight"])
        _set(out, b + "self_attn/out_proj/Dense_0/bias",
             sd[p + "attn.c_proj.bias"])
        norm(p + "ln_2", b + "final_norm")
        _set(out, b + "fc1/Dense_0/kernel", sd[p + "mlp.c_fc.weight"])
        _set(out, b + "fc1/Dense_0/bias", sd[p + "mlp.c_fc.bias"])
        _set(out, b + "fc2/Dense_0/kernel", sd[p + "mlp.c_proj.weight"])
        _set(out, b + "fc2/Dense_0/bias", sd[p + "mlp.c_proj.bias"])
    return out
