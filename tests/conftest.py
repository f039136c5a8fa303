"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX analog of the reference's dry-run worker pool (SURVEY §4):
the sharding/collective logic runs for real, only the hardware is virtual.
Must set the env vars before jax initializes its backends.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize overrides JAX_PLATFORMS at interpreter
# start; force CPU again via config (effective as long as no backend has been
# initialized yet) so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except AttributeError:
    pass

# XLA:CPU's default matmul precision is bfloat16-like (observed ~4e-2 error on
# a 32-dim fp32 dot); parity tests need real fp32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

# Two-tier suite (VERDICT r3 weak #5: 20-min suites stop getting run).
# Tests whose CPU-mesh compile load puts them over ~3.5 s are tier-2:
#   core tier (<3 min):  pytest -m "not slow"
#   full suite (CI):     pytest
# The list is measured, not structural — refresh with
# `pytest --durations=0` after adding compile-heavy tests.
_SLOW_TESTS = {
    "test_tiny_model_end_to_end",
    "test_chunked_prefill_matches_monolithic",
    "test_decode_consistent_with_full_forward_through_engine",
    "test_generate_respects_eos",
    "test_merge_places_patch_embeddings",
    "test_recent_kv_decode_matches_scatter_path",
    "test_sampled_generation_runs",
    "test_short_prompt_skips_chunking",
    "test_flash_matches_reference_causal[1-1024-4-2-128]",
    "test_loader_reads_gptq_projection",
    "test_act_int8_forward_close_to_bf16",
    "test_act_int8_prefill_first_token_agreement",
    "test_act_int8_structured_weights_numerics",
    "test_engine_generate_int4_runs_and_tracks_bf16",
    "test_int4_params_place_and_run_under_tp_mesh",
    "test_int4_tp_shard_map_path_matches",
    "test_load_checkpoint_quantize_bits4",
    "test_quantize_params_bits4_forward_close",
    "test_tpu_ts_engine_generates",
    "test_dp_tp_mesh_generate",
    "test_tp_sharded_generate_matches_single_device",
    "test_tp_sharded_mixed_admission_token_exact",
    "test_tp_sharded_serving_engine",
    "test_pp_forward_matches_single_device",
    "test_pp_loss_matches_nonpp",
    "test_pp_train_step_learns",
    "test_init_quantized_params_direct",
    "test_int8_kv_cache_decode_close_to_bf16",
    "test_quantized_engine_generates",
    "test_ragged_int8_matches_dequant_reference",
    "test_kv_cache_decode_matches_full_forward",
    "test_logits_match_hf[qwen2]",
    "test_logits_match_hf[qwen3]",
    "test_padded_batch_matches_unpadded",
    "test_scatter_token_spans_semantics",
    "test_ragged_matches_reference[lengths0]",
    "test_ragged_matches_reference[lengths1]",
    "test_tp_batch_engine_ragged_matches_xla",
    "test_tp_kernel_int8_matches_dequantized_reference",
    "test_tp_kernel_matches_reference[1-4]",
    "test_tp_kernel_matches_reference[1-8]",
    "test_tp_kernel_matches_reference[2-4]",
    "test_tp_kernel_on_placed_shards",
    "test_tp_serving_exercises_ragged_kernel",
    "test_tp_serving_int8_kv_ragged",
    "test_block_admission_int8_kv_token_exact",
    "test_chunked_admission_fragmented_slots",
    "test_chunked_admission_matches_monolithic",
    "test_determinism_matches_batch_engine",
    "test_int8_kv_serving_matches_batch_engine",
    "test_mixed_admission_overlong_cobatch_isolated",
    "test_mixed_admission_while_decoding_token_exact",
    "test_scan_sliced_mixed_admission_token_exact",
    "test_warmup_compiles_mixed_step_under_small_cap",
    "test_wide_admission_bucket_rungs_token_exact",
    "test_checkpoint_resume",
    "test_rehearse_published_gptq_checkpoint",
    "test_lora_grads_do_not_touch_base",
    "test_lora_sft_on_tp_mesh_matches_single_device",
    "test_lora_sft_reduces_loss",
    "test_sharded_load_on_mesh",
    # NOT slow-marked despite ~8 s: test_greedy_generate_deterministic —
    # the core tier keeps one end-to-end generation smoke.
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy tier-2 test (skip with -m 'not slow')"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
