"""Real-weight day rehearsal (VERDICT r4 item 5).

Synthesizes a FULL-SIZE ChatTS-8B (or 14B) GPTQ-Int4 checkpoint directory
in the exact on-disk format the published exports use — HF ``config.json``,
``model.safetensors.index.json`` + sharded safetensors, AutoGPTQ-v1 packed
projections (``qweight``/``qzeros``/``scales``/``g_idx``), fp16
embeddings/norms/biases, and the TS encoder under the ``ts.*`` spelling the
HF remote-code export ships — then drives the exact path a user of the
reference takes to serve it here (reference contract: README.md:81-104,
checkpoint naming chatts/vllm/chatts_vllm.py:467-470,612-625):

    weights.diagnose()  ->  load_checkpoint(quantize_bits=4)  ->
    one greedy token on the chip.

Zero-egress means the real download can't run in this environment; this
rehearsal proves everything EXCEPT the download — full-size shard streaming,
the GPTQ->native-int4 lossless conversion at scale, HBM placement, and a
first token from the served model.

Usage:
    python scripts/rehearse_real_checkpoint.py                  # 8B, sym
    python scripts/rehearse_real_checkpoint.py --desc-act       # g_idx perm
    python scripts/rehearse_real_checkpoint.py --shape 14b
    python scripts/rehearse_real_checkpoint.py --tiny           # CPU smoke
    python scripts/rehearse_real_checkpoint.py --keep           # keep dir

The synthesized weights are random (values are irrelevant to the contract);
what is exercised is the full key mapping, shard streaming, packed-tensor
decode, and device placement at the real 5-6 GB scale.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GROUP = 128
SHARD_BYTES = int(1.8e9)  # ~1.8 GB shards, like real multi-shard exports


def _hf_config(shape: str) -> dict:
    if shape == "8b":
        d = dict(hidden_size=3584, intermediate_size=18944,
                 num_hidden_layers=28, num_attention_heads=28,
                 num_key_value_heads=4)
    elif shape == "14b":
        d = dict(hidden_size=5120, intermediate_size=13824,
                 num_hidden_layers=48, num_attention_heads=40,
                 num_key_value_heads=8)
    else:  # tiny CPU smoke — shapes must still tile the int4 kernel
        d = dict(hidden_size=256, intermediate_size=512,
                 num_hidden_layers=2, num_attention_heads=4,
                 num_key_value_heads=2)
    d.update(
        architectures=["Qwen2TSForCausalLM"],
        model_type="qwen2_ts",
        vocab_size=152064 if shape != "tiny" else 1024,
        head_dim=d["hidden_size"] // d["num_attention_heads"]
        if shape == "tiny" else 128,
        rms_norm_eps=1e-6,
        rope_theta=1e6,
        max_position_embeddings=32768,
        tie_word_embeddings=False,
        ts={"patch_size": 16, "num_layers": 5,
            "hidden_size": d["hidden_size"], "num_features": 2,
            "max_sequence_length": 4096},
        ts_token_start_index=(152064 if shape != "tiny" else 1024) - 10,
        quantization_config={
            "bits": 4, "group_size": GROUP, "sym": True,
            "desc_act": False, "quant_method": "gptq",
        },
    )
    return d


def synthesize(out_dir: str, shape: str = "8b", desc_act: bool = False,
               seed: int = 0) -> None:
    """Write the checkpoint directory: config.json + sharded safetensors +
    index.  Tensors are generated shard by shard so peak host memory stays
    ~one shard."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    hf = _hf_config(shape)
    if desc_act:
        hf["quantization_config"]["desc_act"] = True
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf, f, indent=2)

    h = hf["hidden_size"]
    inter = hf["intermediate_size"]
    kvd = hf["num_key_value_heads"] * hf["head_dim"]
    qd = hf["num_attention_heads"] * hf["head_dim"]
    vocab = hf["vocab_size"]

    def gptq_linear(tensors: dict, key: str, in_dim: int, out_dim: int):
        groups = in_dim // GROUP
        # Random packed codes directly (8 nibbles per int32) — no giant
        # unpacked intermediate.
        tensors[key + ".qweight"] = rng.integers(
            0, 2**32, size=(in_dim // 8, out_dim), dtype=np.uint32
        ).view(np.int32)
        # Symmetric export: every zero-point is 8, stored minus one (7) —
        # 0x77777777 packed.
        tensors[key + ".qzeros"] = np.full(
            (groups, out_dim // 8), 0x77777777, np.uint32).view(np.int32)
        # Scales sized so dequantized weights look like ~N(0, 1/in_dim)
        # (codes-8 has std ~4.6) — keeps the random forward numerically sane.
        base = 0.22 / np.sqrt(in_dim)
        tensors[key + ".scales"] = (
            base * rng.uniform(0.5, 1.5, size=(groups, out_dim))
        ).astype(np.float16)
        if desc_act:
            # Balanced but non-trivial input->group map (activation-order
            # quantization): a permutation of the trivial map.
            g_idx = np.repeat(np.arange(groups, dtype=np.int32), GROUP)
            tensors[key + ".g_idx"] = g_idx[rng.permutation(in_dim)]
        else:
            tensors[key + ".g_idx"] = np.repeat(
                np.arange(groups, dtype=np.int32), GROUP)

    def fp16(shape_, scale=0.02):
        return (rng.standard_normal(shape_) * scale).astype(np.float16)

    # Build tensors layer by layer, flushing a shard whenever SHARD_BYTES
    # is exceeded (real exports shard the same way).
    weight_map: dict = {}
    pending: dict = {}
    pending_bytes = [0]
    shard_id = [0]
    shard_names: list = []

    def add(name: str, arr: np.ndarray):
        pending[name] = arr
        pending_bytes[0] += arr.nbytes

    def flush():
        if not pending:
            return
        shard_id[0] += 1
        fname = f"model-{shard_id[0]:05d}.safetensors"
        shard_names.append(fname)
        save_file({k: np.ascontiguousarray(v) for k, v in pending.items()},
                  os.path.join(out_dir, fname))
        for k in pending:
            weight_map[k] = fname
        pending.clear()
        pending_bytes[0] = 0

    t0 = time.time()
    add("model.embed_tokens.weight", fp16((vocab, h)))
    for i in range(hf["num_hidden_layers"]):
        lp = f"model.layers.{i}."
        tensors: dict = {}
        gptq_linear(tensors, lp + "self_attn.q_proj", h, qd)
        gptq_linear(tensors, lp + "self_attn.k_proj", h, kvd)
        gptq_linear(tensors, lp + "self_attn.v_proj", h, kvd)
        gptq_linear(tensors, lp + "self_attn.o_proj", qd, h)
        gptq_linear(tensors, lp + "mlp.gate_proj", h, inter)
        gptq_linear(tensors, lp + "mlp.up_proj", h, inter)
        gptq_linear(tensors, lp + "mlp.down_proj", inter, h)
        tensors[lp + "self_attn.q_proj.bias"] = fp16((qd,))
        tensors[lp + "self_attn.k_proj.bias"] = fp16((kvd,))
        tensors[lp + "self_attn.v_proj.bias"] = fp16((kvd,))
        tensors[lp + "input_layernorm.weight"] = np.ones((h,), np.float16)
        tensors[lp + "post_attention_layernorm.weight"] = np.ones(
            (h,), np.float16)
        for k, v in tensors.items():
            add(k, v)
        if pending_bytes[0] > SHARD_BYTES:
            flush()
    add("model.norm.weight", np.ones((h,), np.float16))
    add("lm_head.weight", fp16((vocab, h)))
    # TS encoder under the remote-code export's "ts." spelling (one of the
    # accepted variants — exercises weights._key_candidates).  fp16 on disk,
    # loaded fp32 (value-QA accuracy).
    in_size = hf["ts"]["patch_size"]
    for i in range(hf["ts"]["num_layers"]):
        add(f"ts.mlp.{2 * i}.weight", fp16((h, in_size), scale=0.05))
        add(f"ts.mlp.{2 * i}.bias", np.zeros((h,), np.float16))
        in_size = h
    flush()

    total = sum(
        os.path.getsize(os.path.join(out_dir, f)) for f in shard_names)
    with open(os.path.join(out_dir, "model.safetensors.index.json"),
              "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f)
    print(f"synthesized {shape} GPTQ checkpoint: {len(weight_map)} tensors, "
          f"{len(shard_names)} shards, {total / 1e9:.2f} GB, "
          f"{time.time() - t0:.0f}s -> {out_dir}", flush=True)


def rehearse(ckpt_dir: str, tiny: bool) -> None:
    """diagnose -> load -> one greedy token: the user path, minus the
    download."""
    import jax

    if tiny:
        jax.config.update("jax_platforms", "cpu")
    from chatts_tpu.utils import compile_cache

    compile_cache.enable()

    from chatts_tpu.core.config import GenerationConfig
    from chatts_tpu.models import weights
    from chatts_tpu.processor.processor import ChatTSProcessor
    from chatts_tpu.runtime.engine import InferenceEngine

    # 1. diagnose: the pre-flight lint a user runs on a fresh download.
    t0 = time.time()
    report = weights.diagnose(ckpt_dir)
    print(f"diagnose ({time.time() - t0:.1f}s):\n{report.summary()}",
          flush=True)
    assert report.ok, "diagnose must pass on the published-format checkpoint"
    assert report.gptq_projections > 0, "GPTQ projections must be detected"

    # 2. load: streaming shards -> native int4 serving layout on device.
    t0 = time.time()
    cfg, params = weights.load_checkpoint(ckpt_dir, quantize_bits=4)
    jax.block_until_ready(params)
    from chatts_tpu.models import quantize

    print(f"load_checkpoint: {time.time() - t0:.1f}s, "
          f"{quantize.param_bytes(params) / 1e9:.2f} GB on device",
          flush=True)
    # The conversion must land on the native int4 kernel layout, not the
    # dequant fallback.
    l0 = params["llm"]["layers"][0]["self_attn"]["q_proj"]
    assert "kernel_q4" in l0, f"expected native int4 layout, got {list(l0)}"

    # 3. one greedy token, exactly as a served request would produce it.
    class _Tok:
        pad_token_id = 0
        eos_token_id = 1

        def encode(self, text, add_special_tokens=False):
            v = cfg.llm.vocab_size
            return [10 + (sum(w.encode()) * 31 + len(w)) % (v - 100)
                    for w in text.split()]

    proc = ChatTSProcessor(_Tok(), cfg)
    engine = InferenceEngine(params, cfg)
    ts = np.sin(np.arange(256) / 10.0) * 5.0
    batch = proc(["analyze this metric <ts><ts/> now"], [ts])
    t0 = time.time()
    result = engine.generate(
        batch, GenerationConfig(max_new_tokens=4, greedy=True))
    toks = np.asarray(result.token_ids).tolist()
    print(f"first tokens (greedy): {toks[0][:4]}  "
          f"ttft={result.ttft_s:.2f}s  ({time.time() - t0:.1f}s total)",
          flush=True)
    result2 = engine.generate(
        batch, GenerationConfig(max_new_tokens=4, greedy=True))
    assert np.array_equal(np.asarray(result.token_ids)[:, :4],
                          np.asarray(result2.token_ids)[:, :4]), \
        "greedy decode must be deterministic"
    print("REHEARSAL OK: diagnose -> load -> first token, full size",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", choices=["8b", "14b"], default="8b")
    ap.add_argument("--desc-act", action="store_true",
                    help="write permuted g_idx (activation-order export)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes on CPU (smoke-test the rehearsal)")
    ap.add_argument("--dir", default="/tmp/chatts_rehearsal_ckpt")
    ap.add_argument("--keep", action="store_true",
                    help="keep the synthesized directory")
    ap.add_argument("--synthesize-only", action="store_true")
    args = ap.parse_args()
    shape = "tiny" if args.tiny else args.shape
    try:
        synthesize(args.dir, shape=shape, desc_act=args.desc_act)
        if not args.synthesize_only:
            rehearse(args.dir, tiny=args.tiny)
    finally:
        if not args.keep:
            shutil.rmtree(args.dir, ignore_errors=True)


if __name__ == "__main__":
    main()
