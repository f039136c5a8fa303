"""Quickstart: load a ChatTS checkpoint and analyze a series (README path).

TPU-native analog of the reference quickstart (reference: README.md:80-104):
raw prompt with a <ts><ts/> hole + raw numpy series -> processor ->
model.generate.  Point --model at a ChatTS HF checkpoint directory; without
one, a tiny-random model demonstrates the full path.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None, help="checkpoint directory")
    parser.add_argument("--max-new-tokens", type=int, default=128)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from chatts_tpu.core.config import GenerationConfig, tiny_config
    from chatts_tpu.models import chatts, weights
    from chatts_tpu.processor.processor import ChatTSProcessor
    from chatts_tpu.runtime.engine import InferenceEngine

    if args.model:
        cfg, params, tokenizer = weights.from_pretrained(args.model)
        if tokenizer is None:
            raise SystemExit("checkpoint has no tokenizer files")
        eos = tuple(
            t for t in (tokenizer.eos_token_id,) if t is not None
        )
    else:
        print("[quickstart] no --model given; using a tiny-random ChatTS")
        from tests.helpers import FakeTokenizer

        cfg = tiny_config(vocab_size=512, hidden_size=128,
                          intermediate_size=256, patch_size=16,
                          max_sequence_length=1024)
        params = chatts.init_params(cfg, jax.random.PRNGKey(0))
        tokenizer = FakeTokenizer()
        eos = ()

    processor = ChatTSProcessor(tokenizer, cfg)
    engine = InferenceEngine(params, cfg)

    # The reference README's example series: a sine with a level shift.
    timeseries = np.sin(np.arange(256) / 10) * 5.0
    timeseries[100:] -= 10.0
    prompt = (
        "I have a time series length of 256: <ts><ts/>. Please analyze "
        "the local changes in this time series."
    )
    prompt = (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        f"<|im_start|>user\n{prompt}<|im_end|>\n<|im_start|>assistant\n"
    )

    batch = processor([prompt], [timeseries])
    result = engine.generate(
        batch,
        GenerationConfig(max_new_tokens=args.max_new_tokens, greedy=True,
                         eos_token_ids=eos),
    )
    text = tokenizer.decode(result.token_ids[0], skip_special_tokens=True)
    print(f"TTFT {result.ttft_s * 1e3:.0f} ms, TPOT {result.tpot_s * 1e3:.2f} ms")
    print("---")
    print(text)


if __name__ == "__main__":
    main()
