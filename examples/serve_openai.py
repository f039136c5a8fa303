"""Start the OpenAI-compatible ChatTS server (vLLM-server path analog).

Reference flow: scripts/start_vllm_server.sh serving on :12345 with model
name "chatts" and ≤15 timeseries per prompt.  Same surface here, over the
TPU continuous-batching engine with startup warmup.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=False, default=None)
    parser.add_argument("--port", type=int, default=12345)
    parser.add_argument("--max-batch-size", type=int, default=8)
    parser.add_argument("--max-model-len", type=int, default=6144)
    parser.add_argument("--no-warmup", action="store_true")
    parser.add_argument("--quantize-int8", action="store_true",
                        help="int8 weight-only quantization at load "
                             "(fits an 8B checkpoint on one v5e chip)")
    parser.add_argument("--quantize-int4", action="store_true",
                        help="int4 weight-only quantization (nibble-packed, "
                             "group scales, Pallas matmul); GPTQ-Int4 "
                             "checkpoints import losslessly")
    parser.add_argument("--kv-int8", action="store_true",
                        help="int8 KV cache (halves per-slot cache memory)")
    parser.add_argument("--prefill-act-int8", action="store_true",
                        help="int8 activations for prompt-side matmuls "
                             "(v5e MXU int8 = 2x bf16 TOPS; decode stays "
                             "bf16)")
    parser.add_argument("--prefill-chunk", type=int, default=None,
                        help="admit prompts longer than this in chunks, "
                             "interleaved with decode (bounded compiles)")
    parser.add_argument("--decode-chunk", type=int, default=16,
                        help="decode-scan steps per device round; 16 is the"
                             " latency-tuned measured config, 32 the"
                             " max-throughput one (BENCHMARKS.md r3 grid)")
    # Default 4: the measured r5 latency arm (c32 x bucket4 x chunk16 +
    # early emit = 1,145 tok/s aggregate at 221 ms saturated TTFT p50 vs
    # bucket8/chunk32's 1,280 at 408 ms) — the only arm meeting the
    # <250 ms north star at >=1,100 tok/s.  Throughput-first deployments
    # pass --admission-bucket 8 --decode-chunk 32.
    parser.add_argument("--admission-bucket", type=int, default=4,
                        help="max rows per admission wave (block-family"
                             " ladder caps; widen past 8 for >32 slots)")
    parser.add_argument("--no-admission-binning", action="store_true",
                        help="disable length-classed admission waves "
                             "(pure FIFO; heterogeneous prompt lengths pad "
                             "each wave to its longest member)")
    parser.add_argument("--pad-to-class", action="store_true",
                        help="pad admission waves to their pow2 length "
                             "class: bounds compiled admission shapes for "
                             "open prompt-length traffic at <=2x pad cost")
    parser.add_argument("--early-first-token",
                        action=argparse.BooleanOptionalAction, default=True,
                        help="stream each request's first token right "
                             "after its prompt block instead of after the "
                             "admission round's decode chunk (measured r4: "
                             "TTFT p50 753->408 ms at equal throughput; "
                             "--no-early-first-token reverts)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (local demos/tests; "
                             "overrides the environment's TPU plugin)")
    args = parser.parse_args()

    import jax

    from chatts_tpu.utils import compile_cache

    if args.cpu:
        # BEFORE enable(): the cache dir is keyed by platform.
        jax.config.update("jax_platforms", "cpu")
    compile_cache.enable()  # warm restarts reuse compiled serving shapes

    from chatts_tpu.core.config import tiny_config
    from chatts_tpu.models import chatts, weights
    from chatts_tpu.processor.processor import ChatTSProcessor
    from chatts_tpu.serve.scheduler import ServeEngine
    from chatts_tpu.serve.server import ChatTSServer

    quant_bits = 4 if args.quantize_int4 else (8 if args.quantize_int8 else None)
    if args.model:
        if quant_bits:
            cfg, params = weights.load_checkpoint(args.model,
                                                  quantize_bits=quant_bits)
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(args.model,
                                                      trust_remote_code=False)
        else:
            cfg, params, tokenizer = weights.from_pretrained(args.model)
        eos = tuple(t for t in (getattr(tokenizer, "eos_token_id", None),) if t)
    else:
        print("[serve] no --model; tiny-random ChatTS for demonstration")
        from tests.helpers import FakeTokenizer

        cfg = tiny_config(vocab_size=512, hidden_size=128,
                          intermediate_size=256, patch_size=16,
                          max_sequence_length=1024)
        params = chatts.init_params(cfg, jax.random.PRNGKey(0))
        tokenizer = FakeTokenizer()
        eos = ()

    import jax.numpy as jnp

    processor = ChatTSProcessor(tokenizer, cfg)
    engine = ServeEngine(
        params, cfg, processor,
        max_batch_size=args.max_batch_size,
        max_model_len=args.max_model_len,
        eos_token_ids=eos,
        cache_dtype=jnp.int8 if args.kv_int8 else jnp.bfloat16,
        decode_chunk=args.decode_chunk,
        prefill_chunk=args.prefill_chunk,
        fuse=not quant_bits,
        prefill_act_int8=args.prefill_act_int8,
        admission_bucket=args.admission_bucket,
        admission_binning=not args.no_admission_binning,
        admission_pad_to_class=args.pad_to_class,
        block_early_emit=args.early_first_token,
    )
    if not args.no_warmup:
        print("[serve] warming up prefill buckets...")
        engine.warmup()
    server = ChatTSServer(engine, tokenizer, port=args.port)
    print(f"[serve] listening on :{args.port} (model name 'chatts')")
    server.serve_forever()


if __name__ == "__main__":
    main()
