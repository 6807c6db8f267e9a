"""CLI flag -> config mapping tests (facialmmt_tpu/main.py glue)."""

import numpy as np

from facialmmt_tpu.main import build_argparser, config_from_args


def parse(argv):
    return config_from_args(build_argparser().parse_args(argv))


def test_defaults_match_reference_flags():
    """Defaults mirror reference main.py:12-105."""
    cfg = parse([])
    assert cfg.choice_modality == "T+A+V"
    assert cfg.plm_name == "roberta-large"
    assert cfg.do_eval is True
    assert cfg.num_labels == 7
    assert cfg.tau == 1.0
    assert cfg.facial_emo_impor_threshold == 0.2
    assert cfg.optim.aux_lr == 5e-5
    assert cfg.optim.trg_lr == 7e-6
    assert cfg.optim.weight_decay == 0.01
    assert cfg.optim.warm_up == 0.1
    assert cfg.optim.aux_batch_size == 150
    assert cfg.optim.trg_batch_size == 1
    assert cfg.optim.trg_accumulation_steps == 4
    assert cfg.optim.clip == 0.8
    assert cfg.runtime.seed == 1111
    assert cfg.crossmodal_ta.layers == 2
    assert cfg.crossmodal_ta.num_heads == 12
    assert cfg.audio_utt_transformer_num == 5
    assert cfg.vision_utt_transformer_num == 2
    assert cfg.encoder.hidden_size == 768
    assert cfg.encoder.intermediate_size == 3072


def test_flag_overrides_flow_through():
    cfg = parse(["--choice_modality", "V", "--doEval", "0",
                 "--trg_lr", "1e-3", "--hidden_size", "64",
                 "--num_attention_heads", "4", "--intermediate_size", "128",
                 "--crossmodal_layers_TA", "3", "--patience", "5",
                 "--uttORdia", "dia", "--modalityFuse", "concat",
                 "--compute_dtype", "float32", "--deterministic_gumbel", "1",
                 "--dp", "4", "--tp", "2", "--seed", "7"])
    assert cfg.choice_modality == "V"
    assert cfg.do_eval is False
    assert np.isclose(cfg.optim.trg_lr, 1e-3)
    assert cfg.hidden_size == 64
    assert cfg.encoder.hidden_size == 64
    assert cfg.crossmodal_ta.embed_dim == 64
    assert cfg.crossmodal_ta.layers == 3
    assert cfg.optim.patience == 5
    assert cfg.granularity == "dia"
    assert cfg.modality_fuse == "concat"
    assert cfg.runtime.compute_dtype == "float32"
    assert cfg.runtime.deterministic_gumbel is True
    assert cfg.parallel.dp == 4 and cfg.parallel.tp == 2
    assert cfg.runtime.seed == 7


def test_text_config_resolution():
    from facialmmt_tpu.config import resolve_text_config

    roberta = resolve_text_config(parse(["--plm_name", "roberta-large"]))
    assert roberta.model_type == "roberta" and roberta.pad_token_id == 1
    bert = resolve_text_config(parse(["--plm_name", "bert-large"]))
    assert bert.model_type == "bert" and bert.vocab_size == 30522
    assert bert.layer_norm_eps == 1e-12


def test_adapt_static_shapes_from_dataset():
    from facialmmt_tpu.main import _adapt_static_shapes

    class FakeVisionDs:
        max_utt_len = 17
        feat_dim = 99

    cfg = _adapt_static_shapes(parse([]), FakeVisionDs())
    assert cfg.data.vision_utt_max_len == 17
    assert cfg.data.vision_feat_dim == 99

    class FakeMultimodalDs:
        audio_max_utt_len = 31
        audio_feat_dim = 12
        vision_max_utt_len = 9
        vision_feat_dim = 44

    cfg = _adapt_static_shapes(parse([]), FakeMultimodalDs())
    assert cfg.data.audio_utt_max_len == 31
    assert cfg.data.audio_feat_dim == 12
    assert cfg.data.vision_utt_max_len == 9
    assert cfg.data.vision_feat_dim == 44


def test_prng_impl_flag_and_resolution():
    """--prng_impl plumbs to RuntimeConfig; 'auto' resolves to threefry on
    CPU (so pinned test streams keep reproducing) and honors explicit
    overrides (docs/PARITY.md RNG row)."""
    import jax

    from facialmmt_tpu.config import resolve_prng_impl

    cfg = parse([])
    assert cfg.runtime.prng_impl == "auto"
    resolved = resolve_prng_impl(cfg)
    assert resolved == ("rbg" if jax.default_backend() == "tpu"
                        else "threefry2x32")
    cfg = parse(["--prng_impl", "rbg"])
    assert resolve_prng_impl(cfg) == "rbg"
    # a trainer's root key carries the resolved impl
    import dataclasses

    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.train.trainer import Trainer
    from facialmmt_tpu.utils.observability import MetricWriter

    tiny = FacialMMTConfig.tiny()
    tiny = dataclasses.replace(
        tiny, runtime=dataclasses.replace(tiny.runtime, prng_impl="rbg"))
    t = Trainer(tiny, writer=MetricWriter(""))
    assert "rbg" in str(jax.random.key_impl(t.rng))


def test_remat_auto_policy_and_flags():
    """'auto' remat engages only above the static activation thresholds
    (512 packed images / 4096 text tokens); CLI flags force either way and
    text remat survives the PLM-preset resolution."""
    from facialmmt_tpu.config import resolve_remat, resolve_text_config

    assert resolve_remat("auto", 256, 512) is False   # joint microbatch
    assert resolve_remat("auto", 1024, 512) is True   # eval-batch-128 faces
    assert resolve_remat("auto", 2048, 4096) is False  # 4 dialogues x 512
    assert resolve_remat("auto", 8192, 4096) is True   # dia-trainer batches
    assert resolve_remat(True, 1, 512) is True
    assert resolve_remat(False, 10**6, 512) is False

    cfg = parse([])
    assert cfg.swin.remat == "auto"
    assert resolve_text_config(cfg).remat == "auto"
    cfg = parse(["--swin_remat", "1", "--text_remat", "0"])
    assert cfg.swin.remat is True
    assert resolve_text_config(cfg).remat is False


def test_swin_yaml_and_attention_impl_flags(tmp_path):
    """--swin_config_path loads the reference's YAML format and composes
    with --swin_attention_impl (reference backbone_def.py:8-53)."""
    y = tmp_path / "swin.yaml"
    y.write_text(
        "SwinTransformer:\n  img_size: 112\n  embed_dim: 48\n"
        "  depths: [2, 2]\n  num_heads: [3, 6]\n  drop_path_rate: 0.1\n")
    cfg = parse(["--swin_config_path", str(y),
                 "--swin_attention_impl", "pair",
                 "--swin_mlp_impl", "auto"])
    assert cfg.swin.img_size == 112
    assert cfg.swin.embed_dim == 48
    assert cfg.swin.depths == (2, 2)
    assert cfg.swin.drop_path_rate == 0.1
    assert cfg.swin.attention_impl == "pair"
    assert cfg.swin.mlp_impl == "auto"
    # shipped example parses to swin-tiny
    from facialmmt_tpu.config import SwinConfig
    import os
    ex = SwinConfig.from_yaml(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "swin_conf.yaml"))
    assert ex.depths == (2, 2, 6, 2) and ex.num_heads == (3, 6, 12, 24)


def test_tools_doctor_reports_and_exits_zero_on_cpu():
    """`tools doctor` (environment readiness report) must answer rc=0 with a
    backend line when the backend is reachable.  Runs in a subprocess: doctor
    os._exit()s by design (its probe may abandon a latched backend-init
    thread that SIGABRTs normal teardown)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "from facialmmt_tpu.tools import main; "
         "main(['doctor', '--probe_timeout', '120'])"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "backend            : cpu" in out.stdout
    assert "native face loader" in out.stdout
