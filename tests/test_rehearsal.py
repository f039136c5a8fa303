"""The published-checkpoint user path at tiny scale: synthesize an
AutoGPTQ-v1 directory (sharded safetensors + packed tensors + remote-code
``ts.*`` naming) and drive diagnose -> streaming load -> first greedy token
— the same flow scripts/rehearse_real_checkpoint.py runs at full 8B size on
the chip (reference contract: README.md:81-104)."""
import importlib.util
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "rehearse_real_checkpoint",
        os.path.join(_ROOT, "scripts", "rehearse_real_checkpoint.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_rehearse_published_gptq_checkpoint(tmp_path):
    mod = _load_script()
    ckpt = str(tmp_path / "ckpt")
    mod.synthesize(ckpt, shape="tiny", desc_act=False)
    mod.rehearse(ckpt, tiny=True)  # asserts diagnose ok, native int4
    # layout, and greedy determinism internally


def test_rehearse_desc_act_variant(tmp_path):
    """The activation-order (permuted g_idx) export converts too —
    perm4 records the input permutation the kernel applies at run time."""
    mod = _load_script()
    ckpt = str(tmp_path / "ckpt")
    mod.synthesize(ckpt, shape="tiny", desc_act=True)

    from chatts_tpu.models import weights

    report = weights.diagnose(ckpt)
    assert report.ok and report.gptq_projections > 0
    cfg, params = weights.load_checkpoint(ckpt, quantize_bits=4)
    q = params["llm"]["layers"][0]["self_attn"]["q_proj"]
    assert "kernel_q4" in q and "perm4" in q
