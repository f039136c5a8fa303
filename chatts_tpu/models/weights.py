"""Checkpoint I/O: HF safetensors <-> ChatTS-TPU param pytrees.

The reference loads checkpoints through vLLM's AutoWeightsLoader with a
prefix mapper (reference: chatts/vllm/chatts_vllm.py:467-470,612-625) or HF
``from_pretrained`` remote code.  Here weights stream directly from
safetensors shards into the JAX pytree — each tensor is read once, cast, and
(optionally) placed with its TP sharding immediately, so peak host memory
stays ~one shard, not 2x model size.

Tied-embedding detection matches the reference: if ``lm_head.weight`` is
absent, logits reuse the embedding table (chatts_vllm.py:621-624).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chatts_tpu.core.config import ChatTSConfig
from chatts_tpu.models import qwen, ts_encoder


class LazyStateDict:
    """Dict-like view over one or many safetensors shards; tensors load on
    first access and are not retained."""

    def __init__(self, model_path: str):
        self.model_path = model_path
        index_path = os.path.join(model_path, "model.safetensors.index.json")
        self._name_to_file: Dict[str, str] = {}
        if os.path.exists(index_path):
            with open(index_path) as f:
                index = json.load(f)
            self._name_to_file = dict(index["weight_map"])
        else:
            single = os.path.join(model_path, "model.safetensors")
            if not os.path.exists(single):
                raise FileNotFoundError(
                    f"no model.safetensors[.index.json] under {model_path}"
                )
            from safetensors import safe_open

            with safe_open(single, framework="np") as f:
                for name in f.keys():
                    self._name_to_file[name] = "model.safetensors"

    def __contains__(self, name: str) -> bool:
        return name in self._name_to_file

    def keys(self):
        return self._name_to_file.keys()

    def __getitem__(self, name: str) -> np.ndarray:
        from safetensors import safe_open

        fname = self._name_to_file[name]
        with safe_open(
            os.path.join(self.model_path, fname), framework="np"
        ) as f:
            tensor = f.get_tensor(name)
        # numpy has no bfloat16: safetensors returns a uint16 view via
        # ml_dtypes in framework="np" mode on new versions; normalize through
        # jnp at the call site.
        return tensor

    def get_jnp(self, name: str, dtype) -> jnp.ndarray:
        return jnp.asarray(self[name]).astype(dtype)

    def shape(self, name: str) -> Tuple[int, ...]:
        """Tensor shape from the safetensors header — no data is read."""
        from safetensors import safe_open

        fname = self._name_to_file[name]
        with safe_open(
            os.path.join(self.model_path, fname), framework="np"
        ) as f:
            return tuple(f.get_slice(name).get_shape())


def _key_candidates(name: str) -> Iterator[str]:
    """Checkpoint naming variants for one logical HF-style key.

    The reference's vLLM mapper rewrites ``lm_head.* -> language_model.lm_head.*``
    and ``model.* -> language_model.model.*`` (chatts_vllm.py:467-470), and the
    TS encoder may sit at top level or under ``model.`` depending on which side
    of ``from_pretrained`` the checkpoint was saved from.  The encoder module
    itself is ``self.ts_encoder`` in the reference's vLLM classes
    (chatts_vllm.py:480,661) but the HF remote-code export has also shipped it
    as ``ts.*`` (the config sub-dict's name) — accept both spellings at every
    prefix.  We accept all of them so a real ChatTS-8B/14B export loads
    regardless of provenance.
    """
    names = [name]
    if name.startswith("ts_encoder."):
        names.append("ts." + name[len("ts_encoder."):])
    for n in names:
        yield n
        if n.startswith("model."):
            yield n[len("model."):]
            yield "language_model." + n
        else:
            yield "model." + n
            yield "language_model." + n


class ResolvedStateDict:
    """View over a LazyStateDict that resolves logical keys through the
    naming variants above and records which physical keys were consumed
    (for the conversion lint)."""

    def __init__(self, sd: LazyStateDict):
        self._sd = sd
        self.used: set = set()

    def resolve(self, name: str) -> Optional[str]:
        for cand in _key_candidates(name):
            if cand in self._sd:
                return cand
        return None

    def __contains__(self, name: str) -> bool:
        return self.resolve(name) is not None

    def keys(self):
        return self._sd.keys()

    def __getitem__(self, name: str) -> np.ndarray:
        actual = self.resolve(name)
        if actual is None:
            raise KeyError(name)
        self.used.add(actual)
        return self._sd[actual]

    def get_jnp(self, name: str, dtype) -> jnp.ndarray:
        return jnp.asarray(self[name]).astype(dtype)


def detect_tied_embeddings(sd) -> bool:
    return "lm_head.weight" not in sd


def load_checkpoint(
    model_path: str,
    cfg: Optional[ChatTSConfig] = None,
    *,
    dtype=jnp.bfloat16,
    mesh=None,
    quantize_int8: bool = False,
    quantize_bits: Optional[int] = None,
) -> Tuple[ChatTSConfig, Dict[str, Any]]:
    """Load a ChatTS HF checkpoint directory into (config, params).

    With ``mesh`` given, every tensor is device_put with its TP sharding as it
    streams in (chatts_tpu.parallel.sharding rules).  With
    ``quantize_bits=8`` (alias ``quantize_int8=True``) every projection
    kernel is quantized per-tensor as it streams (peak HBM = int8 model +
    one bf16 tensor), which is how an 8B checkpoint fits a single 16 GB v5e
    chip; ``quantize_bits=4`` uses the nibble-packed group-scale layout
    served by the Pallas int4 matmul — and GPTQ-Int4 checkpoints with
    symmetric zero-points convert to it LOSSLESSLY (no host dequant->requant
    round trip, models/gptq.py:to_native_int4).
    """
    if quantize_int8 and quantize_bits is None:
        quantize_bits = 8
    if quantize_bits not in (None, 4, 8):
        raise ValueError(f"quantize_bits must be 4 or 8, got {quantize_bits}")
    if cfg is None:
        cfg = ChatTSConfig.from_pretrained(model_path)
    # Fail BEFORE any tensor data or device work, with the full expected-vs-
    # found report, instead of a bare KeyError mid-stream (VERDICT r3 item 5:
    # a real ChatTS export may use naming this loader has never met).
    report = diagnose(model_path, cfg)
    if not report.ok:
        raise ValueError(
            f"checkpoint at {model_path} does not match the loader "
            f"contract; run python -m chatts_tpu.models.weights "
            f"{model_path} for details.\n{report.summary()}"
        )
    sd = ResolvedStateDict(LazyStateDict(model_path))

    tied = detect_tied_embeddings(sd)
    if tied != cfg.llm.tie_word_embeddings:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, tie_word_embeddings=tied)
        )

    shardings = None
    if mesh is not None:
        from chatts_tpu.parallel import sharding as sharding_lib

        specs = sharding_lib.chatts_param_specs(cfg)

        def shard_for(path_keys, shape):
            node = specs
            for k in path_keys:
                node = node[k]
            from jax.sharding import NamedSharding

            node = sharding_lib.sanitize_spec(node, shape, mesh)
            return NamedSharding(mesh, node)

    def place(arr: jnp.ndarray, path_keys):
        if mesh is None:
            return arr
        return jax.device_put(arr, shard_for(path_keys, arr.shape))

    def dense(name: str, bias: bool, path_keys, cast=dtype):
        out = None
        kernel = None
        if name + ".weight" in sd:
            kernel = jnp.asarray(sd[name + ".weight"]).astype(cast).T
        else:
            # GPTQ-Int4 checkpoint (reference: README.md:260-263).
            from chatts_tpu.models import gptq

            if not gptq.has_gptq_tensors(sd, name):
                raise KeyError(f"{name}: neither .weight nor .qweight found")
            if quantize_bits == 4:
                # Lossless direct import when the export is symmetric.
                out = gptq.to_native_int4(sd, name)
                for suffix in (".qweight", ".qzeros", ".scales", ".g_idx"):
                    if name + suffix in sd:
                        sd[name + suffix]  # mark consumed for the lint
            if out is None:
                kernel = jnp.asarray(gptq.load_gptq_kernel(sd, name)).astype(cast)
        if out is None and quantize_bits == 4:
            from chatts_tpu.models.quantize import quantize_dense_int4

            out = quantize_dense_int4({"kernel": kernel})
            del kernel
        elif out is None and quantize_bits == 8:
            from chatts_tpu.models.quantize import quantize_dense

            out = quantize_dense({"kernel": kernel})
            del kernel
        elif out is None:
            out = {"kernel": kernel}
        if mesh is not None:
            out = {k: place(v, path_keys + (k,)) for k, v in out.items()}
        if bias and name + ".bias" in sd:
            out["bias"] = place(
                sd.get_jnp(name + ".bias", cast), path_keys + ("bias",)
            )
        return out

    lcfg = cfg.llm
    layers = []
    for i in range(lcfg.num_hidden_layers):
        lp = f"model.layers.{i}."
        pk = ("llm", "layers", i)
        layer = {
            "input_layernorm": place(
                sd.get_jnp(lp + "input_layernorm.weight", dtype),
                pk + ("input_layernorm",),
            ),
            "post_attention_layernorm": place(
                sd.get_jnp(lp + "post_attention_layernorm.weight", dtype),
                pk + ("post_attention_layernorm",),
            ),
            "self_attn": {
                "q_proj": dense(lp + "self_attn.q_proj", lcfg.attention_bias,
                                pk + ("self_attn", "q_proj")),
                "k_proj": dense(lp + "self_attn.k_proj", lcfg.attention_bias,
                                pk + ("self_attn", "k_proj")),
                "v_proj": dense(lp + "self_attn.v_proj", lcfg.attention_bias,
                                pk + ("self_attn", "v_proj")),
                "o_proj": dense(lp + "self_attn.o_proj", False,
                                pk + ("self_attn", "o_proj")),
            },
            "mlp": {
                "gate_proj": dense(lp + "mlp.gate_proj", False,
                                   pk + ("mlp", "gate_proj")),
                "up_proj": dense(lp + "mlp.up_proj", False,
                                 pk + ("mlp", "up_proj")),
                "down_proj": dense(lp + "mlp.down_proj", False,
                                   pk + ("mlp", "down_proj")),
            },
        }
        if lcfg.qk_norm:
            layer["self_attn"]["q_norm"] = place(
                sd.get_jnp(lp + "self_attn.q_norm.weight", dtype),
                pk + ("self_attn", "q_norm"),
            )
            layer["self_attn"]["k_norm"] = place(
                sd.get_jnp(lp + "self_attn.k_norm.weight", dtype),
                pk + ("self_attn", "k_norm"),
            )
        layers.append(layer)

    llm_params: Dict[str, Any] = {
        "embed_tokens": place(
            sd.get_jnp("model.embed_tokens.weight", dtype),
            ("llm", "embed_tokens"),
        ),
        "layers": layers,
        "norm": place(sd.get_jnp("model.norm.weight", dtype), ("llm", "norm")),
    }
    if not tied:
        lm_head = jnp.asarray(sd["lm_head.weight"]).astype(dtype).T
        if quantize_bits == 4:
            from chatts_tpu.models.quantize import quantize_dense_int4

            llm_params["lm_head_q"] = quantize_dense_int4({"kernel": lm_head})
            del lm_head
        elif quantize_bits == 8:
            from chatts_tpu.models.quantize import quantize_dense

            llm_params["lm_head_q"] = quantize_dense({"kernel": lm_head})
            del lm_head
        else:
            llm_params["lm_head"] = place(lm_head, ("llm", "lm_head"))

    # TS encoder: fp32 for numerical parity on value-QA (SURVEY §7).
    ts_params: Dict[str, Any] = {"mlp": []}
    for i in range(cfg.ts.num_layers):
        slot = 2 * i
        ts_params["mlp"].append(
            {
                "kernel": place(
                    jnp.asarray(sd[f"ts_encoder.mlp.{slot}.weight"])
                    .astype(jnp.float32).T,
                    ("ts_encoder", "mlp", i, "kernel"),
                ),
                "bias": place(
                    sd.get_jnp(f"ts_encoder.mlp.{slot}.bias", jnp.float32),
                    ("ts_encoder", "mlp", i, "bias"),
                ),
            }
        )
    if cfg.ts.use_position_embedding:
        ts_params["position_embedding"] = place(
            sd.get_jnp("ts_encoder.position_embedding.weight", jnp.float32),
            ("ts_encoder", "position_embedding"),
        )

    return cfg, {"ts_encoder": ts_params, "llm": llm_params}


def _iter_flat(params: Dict[str, Any], prefix: str = "") -> Iterator[Tuple[str, Any]]:
    for k, v in params.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            yield from _iter_flat(v, name + ".")
        elif isinstance(v, list):
            for i, item in enumerate(v):
                yield from _iter_flat(item, f"{name}.{i}.")
        else:
            yield name, v


def save_checkpoint(model_path: str, cfg: ChatTSConfig, params: Dict[str, Any]) -> None:
    """Export params back to HF layout (single safetensors file + config.json)
    so checkpoints round-trip (LoRA-merged models, fine-tunes)."""
    from safetensors.numpy import save_file

    os.makedirs(model_path, exist_ok=True)
    tensors: Dict[str, np.ndarray] = {}

    llm = params["llm"]
    tensors["model.embed_tokens.weight"] = np.asarray(llm["embed_tokens"], np.float32)
    tensors["model.norm.weight"] = np.asarray(llm["norm"], np.float32)
    if "lm_head" in llm:
        tensors["lm_head.weight"] = np.ascontiguousarray(np.asarray(llm["lm_head"], np.float32).T)
    for i, layer in enumerate(llm["layers"]):
        lp = f"model.layers.{i}."
        tensors[lp + "input_layernorm.weight"] = np.asarray(
            layer["input_layernorm"], np.float32
        )
        tensors[lp + "post_attention_layernorm.weight"] = np.asarray(
            layer["post_attention_layernorm"], np.float32
        )
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            d = layer["self_attn"][proj]
            tensors[lp + f"self_attn.{proj}.weight"] = np.ascontiguousarray(
                np.asarray(d["kernel"], np.float32).T
            )
            if "bias" in d:
                tensors[lp + f"self_attn.{proj}.bias"] = np.asarray(
                    d["bias"], np.float32
                )
        for norm in ("q_norm", "k_norm"):
            if norm in layer["self_attn"]:
                tensors[lp + f"self_attn.{norm}.weight"] = np.asarray(
                    layer["self_attn"][norm], np.float32
                )
        for proj in ("gate_proj", "up_proj", "down_proj"):
            tensors[lp + f"mlp.{proj}.weight"] = np.ascontiguousarray(
                np.asarray(layer["mlp"][proj]["kernel"], np.float32).T
            )

    for i, lyr in enumerate(params["ts_encoder"]["mlp"]):
        tensors[f"ts_encoder.mlp.{2 * i}.weight"] = np.ascontiguousarray(
            np.asarray(lyr["kernel"], np.float32).T
        )
        tensors[f"ts_encoder.mlp.{2 * i}.bias"] = np.asarray(lyr["bias"], np.float32)
    if "position_embedding" in params["ts_encoder"]:
        tensors["ts_encoder.position_embedding.weight"] = np.asarray(
            params["ts_encoder"]["position_embedding"], np.float32
        )

    save_file(tensors, os.path.join(model_path, "model.safetensors"))
    config = {
        "architectures": ["Qwen3TSForCausalLM" if cfg.llm.qk_norm else "Qwen2TSForCausalLM"],
        "model_type": "chatts",
        "vocab_size": cfg.llm.vocab_size,
        "hidden_size": cfg.llm.hidden_size,
        "intermediate_size": cfg.llm.intermediate_size,
        "num_hidden_layers": cfg.llm.num_hidden_layers,
        "num_attention_heads": cfg.llm.num_attention_heads,
        "num_key_value_heads": cfg.llm.num_key_value_heads,
        "head_dim": cfg.llm.head_dim,
        "rms_norm_eps": cfg.llm.rms_norm_eps,
        "rope_theta": cfg.llm.rope_theta,
        "max_position_embeddings": cfg.llm.max_position_embeddings,
        "tie_word_embeddings": cfg.llm.tie_word_embeddings,
        "ts": {
            "patch_size": cfg.ts.patch_size,
            "num_layers": cfg.ts.num_layers,
            "hidden_size": cfg.ts.hidden_size,
            "num_features": cfg.ts.num_features,
            "max_sequence_length": cfg.ts.max_sequence_length,
            "use_position_embedding": cfg.ts.use_position_embedding,
            "use_position_idx": cfg.ts.use_position_idx,
            "embedding_dim": cfg.ts.embedding_dim,
        },
        "ts_token_start_index": cfg.ts_token_start_index,
    }
    with open(os.path.join(model_path, "config.json"), "w") as f:
        json.dump(config, f, indent=2)


import dataclasses as _dataclasses


@_dataclasses.dataclass
class LintReport:
    """Result of :func:`diagnose`: what matched, what's missing (with
    closest-name suggestions), shape mismatches, and what the checkpoint
    contains that the loader would ignore."""

    resolved: Dict[str, str]          # logical key -> physical key
    missing: Tuple[str, ...]          # required logical keys with no match
    unused: Tuple[str, ...]           # physical keys no logical key consumed
    tied_embeddings: bool
    gptq_projections: int             # projections resolved via GPTQ tensors
    # (logical key, expected shape, found shape) for resolved tensors whose
    # checkpoint shape disagrees with the config
    shape_mismatches: Tuple[Tuple[str, Tuple[int, ...], Tuple[int, ...]], ...] = ()
    # missing logical key -> closest checkpoint keys by name similarity
    suggestions: Dict[str, Tuple[str, ...]] = _dataclasses.field(
        default_factory=dict)

    @property
    def ok(self) -> bool:
        return not self.missing and not self.shape_mismatches

    def summary(self) -> str:
        lines = [
            f"resolved: {len(self.resolved)} tensors"
            + (f" ({self.gptq_projections} GPTQ-packed projections)"
               if self.gptq_projections else ""),
            f"tied embeddings: {self.tied_embeddings}",
        ]
        if self.missing:
            lines.append(f"MISSING ({len(self.missing)}):")
            for k in self.missing:
                hint = ""
                if self.suggestions.get(k):
                    hint = f"   (closest in checkpoint: " \
                           f"{', '.join(self.suggestions[k])})"
                lines.append(f"  {k}{hint}")
        if self.shape_mismatches:
            lines.append(f"SHAPE MISMATCHES ({len(self.shape_mismatches)}):")
            lines += [f"  {k}: config expects {exp}, checkpoint has {got}"
                      for k, exp, got in self.shape_mismatches]
        if self.unused:
            lines.append(f"unused checkpoint keys ({len(self.unused)}):")
            lines += [f"  {k}" for k in self.unused]
        if self.ok and not self.unused:
            lines.append("clean: every checkpoint tensor maps to a parameter")
        return "\n".join(lines)


_GPTQ_SUFFIXES = (".qweight", ".qzeros", ".scales", ".g_idx")


def _expected_shapes(cfg: ChatTSConfig) -> Dict[str, Tuple[int, ...]]:
    """Expected HF-layout (out, in) tensor shapes for every logical key,
    derived from the config — lets :func:`diagnose` catch a config/checkpoint
    disagreement before any device work.  GPTQ-packed tensors are excluded
    (their shapes depend on pack-factor/group-size)."""
    lcfg, tcfg = cfg.llm, cfg.ts
    h = lcfg.hidden_size
    qd = lcfg.num_attention_heads * lcfg.head_dim
    kvd = lcfg.num_key_value_heads * lcfg.head_dim
    exp: Dict[str, Tuple[int, ...]] = {
        "model.embed_tokens.weight": (lcfg.vocab_size, h),
        "model.norm.weight": (h,),
        "lm_head.weight": (lcfg.vocab_size, h),
    }
    for i in range(lcfg.num_hidden_layers):
        lp = f"model.layers.{i}."
        exp[lp + "input_layernorm.weight"] = (h,)
        exp[lp + "post_attention_layernorm.weight"] = (h,)
        exp[lp + "self_attn.q_proj.weight"] = (qd, h)
        exp[lp + "self_attn.k_proj.weight"] = (kvd, h)
        exp[lp + "self_attn.v_proj.weight"] = (kvd, h)
        exp[lp + "self_attn.o_proj.weight"] = (h, qd)
        exp[lp + "self_attn.q_proj.bias"] = (qd,)
        exp[lp + "self_attn.k_proj.bias"] = (kvd,)
        exp[lp + "self_attn.v_proj.bias"] = (kvd,)
        exp[lp + "mlp.gate_proj.weight"] = (lcfg.intermediate_size, h)
        exp[lp + "mlp.up_proj.weight"] = (lcfg.intermediate_size, h)
        exp[lp + "mlp.down_proj.weight"] = (h, lcfg.intermediate_size)
        if lcfg.qk_norm:
            exp[lp + "self_attn.q_norm.weight"] = (lcfg.head_dim,)
            exp[lp + "self_attn.k_norm.weight"] = (lcfg.head_dim,)
    # TS patch-MLP input width per position variant (reference:
    # chatts_vllm.py:73-81).
    if tcfg.use_position_embedding:
        in_size = tcfg.patch_size + tcfg.embedding_dim * tcfg.patch_size
        exp["ts_encoder.position_embedding.weight"] = (
            tcfg.max_sequence_length + 1, tcfg.embedding_dim)
    elif tcfg.use_position_idx:
        in_size = 2 * tcfg.patch_size
    else:
        in_size = tcfg.patch_size
    for i in range(tcfg.num_layers):
        exp[f"ts_encoder.mlp.{2 * i}.weight"] = (tcfg.hidden_size, in_size)
        exp[f"ts_encoder.mlp.{2 * i}.bias"] = (tcfg.hidden_size,)
        in_size = tcfg.hidden_size
    return exp


def diagnose(
    model_path: str, cfg: Optional[ChatTSConfig] = None
) -> LintReport:
    """Dry-run the key mapping of :func:`load_checkpoint` without reading any
    tensor data: reports unmatched keys (with closest-name suggestions),
    config-vs-checkpoint shape disagreements (header metadata only), and
    checkpoint keys the loader would ignore — instead of raising KeyError
    mid-stream on a real conversion.

    Use this before converting a real ChatTS-8B/14B export
    (reference contract: chatts/vllm/chatts_vllm.py:467-470,612-625) to see
    whether the loader understands the checkpoint's naming scheme.
    """
    if cfg is None:
        cfg = ChatTSConfig.from_pretrained(model_path)
    lazy = LazyStateDict(model_path)
    sd = ResolvedStateDict(lazy)
    expected = _expected_shapes(cfg)

    resolved: Dict[str, str] = {}
    missing = []
    shape_mismatches = []
    gptq_projections = 0

    def want(logical: str, required: bool = True,
             check_shape: bool = True) -> bool:
        actual = sd.resolve(logical)
        if actual is not None:
            resolved[logical] = actual
            sd.used.add(actual)
            exp = expected.get(logical)
            if check_shape and exp is not None:
                got = lazy.shape(actual)
                if tuple(got) != tuple(exp):
                    shape_mismatches.append((logical, tuple(exp),
                                             tuple(got)))
            return True
        if required:
            missing.append(logical)
        return False

    def want_proj(logical: str, bias: bool):
        nonlocal gptq_projections
        if want(logical + ".weight", required=False):
            pass
        elif any(sd.resolve(logical + s) for s in _GPTQ_SUFFIXES[:3]):
            gptq_projections += 1
            for s in _GPTQ_SUFFIXES:
                # Packed shapes depend on pack-factor/group-size; name-only.
                want(logical + s, required=(s != ".g_idx"),
                     check_shape=False)
        else:
            missing.append(logical + ".weight")
        if bias:
            want(logical + ".bias", required=False)

    lcfg = cfg.llm
    want("model.embed_tokens.weight")
    want("model.norm.weight")
    for i in range(lcfg.num_hidden_layers):
        lp = f"model.layers.{i}."
        want(lp + "input_layernorm.weight")
        want(lp + "post_attention_layernorm.weight")
        for proj in ("q_proj", "k_proj", "v_proj"):
            want_proj(lp + "self_attn." + proj, bias=lcfg.attention_bias)
        want_proj(lp + "self_attn.o_proj", bias=False)
        for proj in ("gate_proj", "up_proj", "down_proj"):
            want_proj(lp + "mlp." + proj, bias=False)
        if lcfg.qk_norm:
            want(lp + "self_attn.q_norm.weight")
            want(lp + "self_attn.k_norm.weight")
    tied = not want("lm_head.weight", required=False)
    for i in range(cfg.ts.num_layers):
        want(f"ts_encoder.mlp.{2 * i}.weight")
        want(f"ts_encoder.mlp.{2 * i}.bias")
    if cfg.ts.use_position_embedding:
        want("ts_encoder.position_embedding.weight")

    suggestions: Dict[str, Tuple[str, ...]] = {}
    if missing:
        import difflib

        all_keys = list(sd.keys())
        for k in missing:
            close = difflib.get_close_matches(k, all_keys, n=2, cutoff=0.6)
            if close:
                suggestions[k] = tuple(close)

    unused = tuple(sorted(set(sd.keys()) - sd.used))
    return LintReport(
        resolved=resolved,
        missing=tuple(missing),
        unused=unused,
        tied_embeddings=tied,
        gptq_projections=gptq_projections,
        shape_mismatches=tuple(shape_mismatches),
        suggestions=suggestions,
    )


# Back-compat name (pre-r4 scripts/tests import lint_checkpoint).
lint_checkpoint = diagnose


def from_pretrained(
    model_path: str, *, dtype=jnp.bfloat16, mesh=None
) -> Tuple[ChatTSConfig, Dict[str, Any], Any]:
    """(config, params, tokenizer) from an HF checkpoint directory.  The
    tokenizer loads via transformers when tokenizer files exist, else None."""
    cfg, params = load_checkpoint(model_path, dtype=dtype, mesh=mesh)
    tokenizer = None
    for probe in ("tokenizer.json", "tokenizer_config.json", "vocab.json"):
        if os.path.exists(os.path.join(model_path, probe)):
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(
                model_path, trust_remote_code=False
            )
            break
    return cfg, params, tokenizer


if __name__ == "__main__":  # conversion lint: python -m chatts_tpu.models.weights CKPT
    import sys

    report = lint_checkpoint(sys.argv[1])
    print(report.summary())
    sys.exit(0 if report.ok else 1)
