"""CLI entry point, mirroring the reference flag surface (reference main.py:12-105).

Usage (same flags as NUSTM/FacialMMT):
  python -m facialmmt_tpu.main --choice_modality V --doEval 1 \
      --data_load_path preprocess_data --load_unimodal_path unimodal_model_V.pt
  python -m facialmmt_tpu.main --choice_modality T+A+V --plm_name roberta-large \
      --doEval 1 --load_multimodal_path ... --load_swin_path ...
  python -m facialmmt_tpu.main --choice_modality T+A+V --doEval 0 ...  (train)

Torch checkpoints (.pt, the reference's whole-module pickles) are converted on
load; orbax checkpoint directories load natively.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="FacialMMT-TPU: facial-expression-aware multimodal "
                    "multi-task ERC, TPU-native")
    # dataset paths (reference main.py:16-32)
    p.add_argument("--load_anno_csv_path", type=str, default="")
    p.add_argument("--meld_text_path", type=str, default="")
    p.add_argument("--num_labels", type=int, default=7)
    p.add_argument("--data_load_path", type=str, default="preprocess_data")
    p.add_argument("--save_Model_path", type=str, default="saved_model")
    p.add_argument("--plm_name", type=str, default="roberta-large",
                   choices=["roberta-large", "bert-large",
                            "chinese-roberta-large"])
    p.add_argument("--choice_modality", type=str, default="T+A+V",
                   choices=["T+A+V", "V", "T+A", "T+V", "T"])
    # aff-wild2 (reference main.py:27-32)
    p.add_argument("--data_folder", type=str, default="")
    p.add_argument("--anno_folder", type=str, default="")
    p.add_argument("--data_list_train", type=str, default="")
    # swin (reference main.py:35-43)
    p.add_argument("--pretrained_backbone_path", type=str, default="")
    p.add_argument("--tau", type=float, default=1.0)
    p.add_argument("--FacialEmoImpor_threshold", type=float, default=0.2)
    # tuning (reference main.py:46-61)
    p.add_argument("--num_epochs", type=int, default=1)
    p.add_argument("--aux_lr", type=float, default=5e-5)
    p.add_argument("--trg_lr", type=float, default=7e-6)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--warm_up", type=float, default=0.1)
    p.add_argument("--aux_batch_size", type=int, default=150)
    p.add_argument("--trg_batch_size", type=int, default=1)
    p.add_argument("--aux_accumulation_steps", type=int, default=1)
    p.add_argument("--trg_accumulation_steps", type=int, default=4)
    # fusion (reference main.py:64-70)
    p.add_argument("--crossmodal_layers_TA", type=int, default=2)
    p.add_argument("--crossmodal_num_heads_TA", type=int, default=12)
    p.add_argument("--crossmodal_attn_dropout_TA", type=float, default=0.1)
    p.add_argument("--crossmodal_layers_TA_V", type=int, default=2)
    p.add_argument("--crossmodal_num_heads_TA_V", type=int, default=12)
    p.add_argument("--crossmodal_attn_dropout_TA_V", type=float, default=0.1)
    # encoders (reference main.py:74-84)
    p.add_argument("--audio_utt_Transformernum", type=int, default=5)
    p.add_argument("--vision_utt_Transformernum", type=int, default=2)
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_attention_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=3072)
    p.add_argument("--hidden_dropout_prob", type=float, default=0.1)
    p.add_argument("--attention_probs_dropout_prob", type=float, default=0.1)
    p.add_argument("--layer_norm_eps", type=float, default=1e-12)
    # misc (reference main.py:87-103)
    p.add_argument("--clip", type=float, default=0.8)
    p.add_argument("--aux_log_interval", type=int, default=1000)
    p.add_argument("--trg_log_interval", type=int, default=1600)
    p.add_argument("--seed", type=int, default=1111)
    p.add_argument("--doEval", type=int, default=1)
    p.add_argument("--load_unimodal_path", type=str,
                   default="unimodal_model_V.pt")
    p.add_argument("--load_multimodal_path", type=str,
                   default="multimodal_model_T+A+V_RoBERTa.pt")
    p.add_argument("--load_swin_path", type=str, default="best_swin_RoBERTa.pt")
    p.add_argument("--pretrained_model_dir", type=str,
                   default="pretrained_model")
    # appendix (CCAC2023/M3ED) capabilities
    p.add_argument("--modalityFuse", type=str, default="crossmodal",
                   choices=["crossmodal", "concat"])
    p.add_argument("--uttORdia", type=str, default="utt",
                   choices=["utt", "dia"])
    p.add_argument("--patience", type=int, default=0,
                   help="early stopping on val loss; 0 disables")
    p.add_argument("--load_best_model_path", type=str, default="",
                   help="orbax checkpoint dir for dia-level doEval "
                        "(reference (Appendix)CCAC2023/main.py:90); defaults "
                        "to --save_Model_path")
    p.add_argument("--submission_template", type=str,
                   default="nustm_submission_empty.csv",
                   help="competition CSV template; skipped when absent "
                        "(reference (Appendix)CCAC2023/train.py:188)")
    p.add_argument("--submission_out", type=str, default="",
                   help="filled submission CSV path; defaults to "
                        "<save_Model_path>/nustm_submission.csv")
    p.add_argument("--pred_dump_path", type=str, default="",
                   help="'pred true' dump file (reference "
                        "(Appendix)CCAC2023/utils/eval_metrics.py:22-35)")
    p.add_argument("--pretrainedtextmodel_path", type=str, default="",
                   help="HF dir for the text tower tokenizer/weights, e.g. "
                        "chinese-roberta-wwm-ext-large for M3ED (reference "
                        "(Appendix)CCAC2023/main.py:20)")
    p.add_argument("--m3ed_project_path", type=str, default="",
                   help="M3ED data dir ({split}_utt_text_noEmo.json + "
                        "m3ed_{split}_{audio,vision}_{utt,dia}.pkl + profile "
                        "jsons — reference (Appendix)CCAC2023/main.py); when "
                        "set, multimodal data loads M3ED-style (precomputed "
                        "vision features, no faces/FER branch)")
    # TPU-native extensions
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--max_seq_length", type=int, default=512,
                   help="dialogue token budget (reference hardcodes 512, "
                        "src/meld_bert_extraText.py:9)")
    p.add_argument("--text_preset", type=str, default="auto",
                   choices=["auto", "tiny"],
                   help="text tower size; 'auto' resolves from --plm_name, "
                        "'tiny' is for tests/dry-runs")
    p.add_argument("--swin_from_target", type=int, default=0,
                   help="1 = joint training (target grads update Swin); "
                        "0 = the reference's discard semantics "
                        "(reference train.py:305-340)")
    p.add_argument("--swin_config_path", type=str, default="",
                   help="Backbone YAML in the reference's swin_conf.yaml "
                        "format (reference backbone_def.py:8-53; example "
                        "shipped at configs/swin_conf.yaml)")
    p.add_argument("--swin_attention_impl", type=str, default="auto",
                   choices=["xla", "pallas", "pair", "auto"],
                   help="Swin window-attention kernel; 'pair' = paired-"
                        "window Pallas kernel, 'auto' (default) = best "
                        "measured per stage on TPU, plain XLA on CPU "
                        "(ops/pallas/window_attention.py)")
    p.add_argument("--swin_mlp_impl", type=str, default="auto",
                   choices=["xla", "pallas", "auto"],
                   help="Swin LN+MLP+residual kernel, eval-only "
                        "('auto' = on when on TPU; ops/pallas/block_mlp.py)")
    p.add_argument("--swin_merge_impl", type=str, default="auto",
                   choices=["raster", "window", "auto"],
                   help="patch-merging stage-transition layout; 'window' = "
                        "one static gather in window-resident layout "
                        "(exactly equivalent; SwinConfig.merge_impl)")
    p.add_argument("--fused_text_attention", type=str, default="",
                   choices=["", "auto", "on", "off"],
                   help="Pallas fused attention for the text tower "
                        "(ops/pallas/attention.py); '' = config default")
    p.add_argument("--fused_fusion_attention", type=str, default="",
                   choices=["", "auto", "on", "off"],
                   help="Pallas fused attention for the fusion stack (audio/"
                        "vision self-attn towers + crossmodal MulT); "
                        "'' = config default ('auto' = on-TPU)")
    p.add_argument("--eval_face_chunk", type=int, default=0,
                   help=">0: stream eval Swin over the packed faces in tiles "
                        "of this size (lax.map) so huge eval batches fit "
                        "HBM; 0 = fully-fused eval (train/steps.py)")
    p.add_argument("--deterministic_gumbel", type=int, default=0)
    p.add_argument("--debug_nans", type=int, default=0)
    p.add_argument("--profile_dir", type=str, default="",
                   help="non-empty: capture a 5-step jax.profiler device "
                        "trace of the first training steps into this dir "
                        "(TensorBoard/xprof viewable)")
    p.add_argument("--prng_impl", type=str, default="auto",
                   choices=["auto", "rbg", "threefry2x32"],
                   help="dropout/gumbel RNG: 'auto' = TPU hardware generator "
                        "on TPU (threefry masks cost ~46 ms/joint microbatch "
                        "via remat), threefry elsewhere")
    p.add_argument("--swin_remat", type=str, default="auto",
                   choices=["auto", "0", "1"],
                   help="backward rematerialization of Swin blocks: 'auto' = "
                        "only above 512 packed images (below, the saved "
                        "activations fit HBM and the re-forward is waste)")
    p.add_argument("--text_remat", type=str, default="auto",
                   choices=["auto", "0", "1"],
                   help="backward rematerialization of text-encoder layers: "
                        "'auto' = only above 4096 tokens (8 dialogues x 512)")
    p.add_argument("--resume", type=int, default=0,
                   help="resume from the latest epoch checkpoint")
    p.add_argument("--dp", type=int, default=-1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--metrics_path", type=str, default="metrics.jsonl")
    return p


def config_from_args(args) -> "FacialMMTConfig":
    from facialmmt_tpu.config import (CrossModalConfig, DataConfig,
                                      EncoderConfig, FacialMMTConfig,
                                      OptimConfig, ParallelConfig,
                                      RuntimeConfig)

    enc = EncoderConfig(
        hidden_size=args.hidden_size,
        num_attention_heads=args.num_attention_heads,
        intermediate_size=args.intermediate_size,
        hidden_dropout_prob=args.hidden_dropout_prob,
        attention_probs_dropout_prob=args.attention_probs_dropout_prob,
        layer_norm_eps=args.layer_norm_eps)
    cm_ta = CrossModalConfig(embed_dim=args.hidden_size,
                             num_heads=args.crossmodal_num_heads_TA,
                             layers=args.crossmodal_layers_TA,
                             attn_dropout=args.crossmodal_attn_dropout_TA)
    cm_tav = CrossModalConfig(embed_dim=args.hidden_size,
                              num_heads=args.crossmodal_num_heads_TA_V,
                              layers=args.crossmodal_layers_TA_V,
                              attn_dropout=args.crossmodal_attn_dropout_TA_V)
    if args.fused_fusion_attention:
        enc = dataclasses.replace(enc,
                                  fused_attention=args.fused_fusion_attention)
        cm_ta = dataclasses.replace(
            cm_ta, fused_attention=args.fused_fusion_attention)
        cm_tav = dataclasses.replace(
            cm_tav, fused_attention=args.fused_fusion_attention)
    data = DataConfig(load_anno_csv_path=args.load_anno_csv_path,
                      meld_text_path=args.meld_text_path,
                      data_load_path=args.data_load_path,
                      data_folder=args.data_folder,
                      anno_folder=args.anno_folder,
                      data_list_train=args.data_list_train,
                      max_seq_length=args.max_seq_length)
    optim = OptimConfig(num_epochs=args.num_epochs, aux_lr=args.aux_lr,
                        trg_lr=args.trg_lr, weight_decay=args.weight_decay,
                        warm_up=args.warm_up,
                        aux_batch_size=args.aux_batch_size,
                        trg_batch_size=args.trg_batch_size,
                        aux_accumulation_steps=args.aux_accumulation_steps,
                        trg_accumulation_steps=args.trg_accumulation_steps,
                        clip=args.clip, patience=args.patience)
    runtime = RuntimeConfig(seed=args.seed, compute_dtype=args.compute_dtype,
                            profile_dir=args.profile_dir,
                            eval_face_chunk=args.eval_face_chunk,
                            deterministic_gumbel=bool(
                                args.deterministic_gumbel),
                            aux_log_interval=args.aux_log_interval,
                            trg_log_interval=args.trg_log_interval,
                            save_model_path=args.save_Model_path,
                            metrics_path=args.metrics_path,
                            prng_impl=args.prng_impl)
    kw = {}
    if args.text_preset == "tiny":
        from facialmmt_tpu.config import TextEncoderConfig

        kw["text"] = TextEncoderConfig.tiny(
            "roberta" if args.plm_name == "roberta-large" else "bert")
    from facialmmt_tpu.config import SwinConfig

    swin = (SwinConfig.from_yaml(args.swin_config_path)
            if args.swin_config_path else SwinConfig())
    remat_of = lambda s: s if s == "auto" else bool(int(s))
    kw["swin"] = dataclasses.replace(
        swin, attention_impl=args.swin_attention_impl,
        mlp_impl=args.swin_mlp_impl, merge_impl=args.swin_merge_impl,
        remat=remat_of(args.swin_remat))
    if args.text_remat != "auto":
        from facialmmt_tpu.config import TextEncoderConfig as _TC

        kw["text"] = dataclasses.replace(
            kw.get("text", _TC()), remat=remat_of(args.text_remat))
    return FacialMMTConfig(
        choice_modality=args.choice_modality, plm_name=args.plm_name,
        do_eval=bool(args.doEval), num_labels=args.num_labels,
        hidden_size=args.hidden_size, tau=args.tau,
        facial_emo_impor_threshold=args.FacialEmoImpor_threshold,
        audio_utt_transformer_num=args.audio_utt_Transformernum,
        vision_utt_transformer_num=args.vision_utt_Transformernum,
        modality_fuse=args.modalityFuse, granularity=args.uttORdia,
        swin_from_target=bool(args.swin_from_target),
        text_fused_attention=args.fused_text_attention,
        encoder=enc, crossmodal_ta=cm_ta, crossmodal_ta_v=cm_tav,
        data=data, optim=optim, runtime=runtime,
        parallel=ParallelConfig(dp=args.dp, tp=args.tp),
        load_unimodal_path=args.load_unimodal_path,
        load_multimodal_path=args.load_multimodal_path,
        load_swin_path=args.load_swin_path,
        pretrained_backbone_path=args.pretrained_backbone_path,
        pretrained_text_model_path=args.pretrainedtextmodel_path, **kw)


def resolve_pretrained_text_dir(cfg, pretrained_model_dir: str):
    """Training starts the text tower from pretrained PLM weights; the
    reference resolves <project>/pretrained_model/<plm_name> (reference
    main.py:118 -> RobertaModel/BertModel.from_pretrained,
    src/models.py:72-77).  Same default here when --pretrainedtextmodel_path
    is empty; if the default dir is absent too, the trainer warns loudly and
    random-inits (tests / ablations)."""
    if (not cfg.do_eval and cfg.choice_modality != "V"
            and not cfg.pretrained_text_model_path):
        default_plm_dir = os.path.join(pretrained_model_dir, cfg.plm_name)
        if os.path.isdir(default_plm_dir):
            return cfg.replace(pretrained_text_model_path=default_plm_dir)
    return cfg


def _adapt_static_shapes(cfg, train_ds):
    """Derive static shape hyperparameters from the data, as the reference does
    at main.py:134-145, but once, explicitly."""
    data = cfg.data
    kw = dict(audio_utt_max_len=data.audio_utt_max_len,
              vision_utt_max_len=data.vision_utt_max_len,
              audio_feat_dim=data.audio_feat_dim,
              vision_feat_dim=data.vision_feat_dim)
    if hasattr(train_ds, "audio_max_utt_len"):
        kw["audio_utt_max_len"] = train_ds.audio_max_utt_len
        kw["audio_feat_dim"] = train_ds.audio_feat_dim
    if hasattr(train_ds, "vision_max_utt_len"):
        kw["vision_utt_max_len"] = train_ds.vision_max_utt_len
        kw["vision_feat_dim"] = train_ds.vision_feat_dim
    elif hasattr(train_ds, "max_utt_len"):
        kw["vision_utt_max_len"] = train_ds.max_utt_len
        kw["vision_feat_dim"] = train_ds.feat_dim
    return cfg.replace(data=dataclasses.replace(data, **kw))


def load_torch_unimodal(cfg, path):
    from facialmmt_tpu.checkpoint.torch_convert import (convert_unimodal,
                                                        load_torch_state_dict)

    return convert_unimodal(load_torch_state_dict(path), cfg)


def load_torch_multimodal(cfg, mm_path, swin_path):
    from facialmmt_tpu.checkpoint.torch_convert import (convert_multimodal,
                                                        convert_swin_fer,
                                                        load_torch_state_dict)

    mm = convert_multimodal(load_torch_state_dict(mm_path), cfg)
    sw = convert_swin_fer(load_torch_state_dict(swin_path), cfg)
    params = {"multimodal": mm["params"], "swin_model": sw["params"]}
    batch_stats = {"swin_model": sw["batch_stats"]}
    return params, batch_stats


def run(argv=None) -> float:
    args = build_argparser().parse_args(argv)
    cfg = config_from_args(args)

    # The DEFAULT template name mirrors the file the reference ships with its
    # project ((Appendix)CCAC2023/nustm_submission_empty.csv); when it is
    # simply not present here, skip the CSV with a note — but a template the
    # user EXPLICITLY pointed at must exist (the trainer raises), so a typo'd
    # path can't silently drop the competition artifact.
    default_template = build_argparser().get_default("submission_template")
    if (args.submission_template == default_template
            and not os.path.exists(args.submission_template)):
        args.submission_template = ""

    cfg = resolve_pretrained_text_dir(cfg, args.pretrained_model_dir)

    from facialmmt_tpu.train.trainer import Trainer
    from facialmmt_tpu.utils.observability import MetricWriter

    if args.debug_nans:
        from facialmmt_tpu.utils.observability import enable_nan_debugging

        enable_nan_debugging()
    writer = MetricWriter(cfg.runtime.metrics_path)
    if not cfg.do_eval:
        # SIGTERM -> resume checkpoint -> clean stop (utils/preemption.py);
        # training restarted with --resume 1 continues the interrupted epoch
        from facialmmt_tpu.utils.preemption import install_preemption_guard

        install_preemption_guard()
    print("&" * 50)

    if cfg.choice_modality == "V":
        from facialmmt_tpu.data.meld import MeldVisionDataset

        test_ds = MeldVisionDataset(cfg.data.data_load_path, "test")
        cfg = _adapt_static_shapes(cfg, test_ds)
        trainer = Trainer(cfg, writer)
        if cfg.do_eval:
            print("Evaluating on the test set directly...")
            ckpt_path = os.path.join(args.pretrained_model_dir,
                                     cfg.load_unimodal_path)
            variables = load_torch_unimodal(cfg, ckpt_path)
            return trainer.eval_unimodal_only(variables["params"], test_ds)
        print("Training from scratch...")
        train_ds = MeldVisionDataset(cfg.data.data_load_path, "train")
        valid_ds = MeldVisionDataset(cfg.data.data_load_path, "val")
        return trainer.run_unimodal(train_ds, valid_ds, test_ds,
                                    resume=bool(args.resume))

    # ---- M3ED text preprocessing (shared by the T and M3ED-multimodal
    # paths; reference (Appendix)CCAC2023/src/data_bert_extraText.py) ----
    m3ed_text_dir = args.m3ed_project_path or cfg.data.meld_text_path

    def build_m3ed_text_arrays(split):
        cache = os.path.join(cfg.data.data_load_path, "T",
                             f"text_{split}_{cfg.plm_name}_m3ed.npz")
        if os.path.exists(cache):
            z = np.load(cache)
            return z["ids"], z["mask"], z["sep"], z["labels"]
        from transformers import AutoTokenizer

        from facialmmt_tpu.data.text_prep import M3edTextPreprocessor

        tok = AutoTokenizer.from_pretrained(
            cfg.pretrained_text_model_path or cfg.plm_name)
        prep = M3edTextPreprocessor(tok, cfg.data.max_seq_length)
        feats = prep.preprocess_split(
            os.path.join(m3ed_text_dir, f"{split}_utt_text_noEmo.json"))
        ids, mask, sep, labels = M3edTextPreprocessor.to_arrays(feats)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(cache, ids=ids, mask=mask, sep=sep, labels=labels)
        return ids, mask, sep, labels

    if cfg.choice_modality == "T":
        # appendix text-only path (reference
        # (Appendix)CCAC2023/utils/dataset.py:112-147 + data_bert_extraText.py)
        from facialmmt_tpu.data.m3ed import M3edTextDataset
        from facialmmt_tpu.train.trainer import TextTrainer

        def build_text(split):
            return M3edTextDataset(*build_m3ed_text_arrays(split))

        text_trainer = TextTrainer(cfg, writer)
        if cfg.do_eval:
            # reference writes the submission CSV + pred/true dump for the
            # utt granularity too ((Appendix)CCAC2023/train.py:166-196)
            return text_trainer.eval_text_only(
                build_text("test"),
                ckpt_dir=args.load_best_model_path or None,
                submission_template=args.submission_template,
                submission_out=args.submission_out,
                pred_dump_path=args.pred_dump_path)
        return text_trainer.run_text(build_text("train"), build_text("val"),
                                     build_text("test"),
                                     resume=bool(args.resume))

    if args.m3ed_project_path:
        # M3ED multimodal paths (reference (Appendix)CCAC2023/utils/
        # dataset.py:165-302): precomputed audio + vision features, no
        # faces/FER branch; utterance- or dialogue-level granularity
        from facialmmt_tpu.data.m3ed import (M3edDialogueDataset,
                                             M3edMultimodalDataset)
        from facialmmt_tpu.train.trainer import DialogueTrainer, TextTrainer

        ds_cls = (M3edDialogueDataset if cfg.granularity == "dia"
                  else M3edMultimodalDataset)

        def build_m3ed(split):
            ids, mask, sep, _ = build_m3ed_text_arrays(split)
            return ds_cls(args.m3ed_project_path, split, ids, mask, sep)

        m3ed_test = build_m3ed("test")
        cfg = _adapt_static_shapes(cfg, m3ed_test)
        if cfg.granularity == "dia":
            dia_trainer = DialogueTrainer(cfg, writer)
            if cfg.do_eval:
                return dia_trainer.eval_dialogue_only(
                    m3ed_test,
                    ckpt_dir=args.load_best_model_path or None,
                    submission_template=args.submission_template,
                    submission_out=args.submission_out,
                    pred_dump_path=args.pred_dump_path)
            return dia_trainer.run_dialogue(
                build_m3ed("train"), build_m3ed("val"), m3ed_test,
                resume=bool(args.resume))
        feat_trainer = TextTrainer(cfg, writer)
        if cfg.do_eval:
            return feat_trainer.eval_text_only(
                m3ed_test, ckpt_dir=args.load_best_model_path or None,
                submission_template=args.submission_template,
                submission_out=args.submission_out,
                pred_dump_path=args.pred_dump_path)
        return feat_trainer.run_text(build_m3ed("train"), build_m3ed("val"),
                                     m3ed_test, resume=bool(args.resume))

    # T+A+V (and appendix subsets)
    from facialmmt_tpu.data.meld import MeldMultimodalDataset, MeldTextArrays
    from facialmmt_tpu.data.text_prep import MeldTextPreprocessor

    def build_split(split):
        import json

        is_roberta = cfg.plm_name == "roberta-large"
        cache = os.path.join(cfg.data.data_load_path, cfg.choice_modality,
                             f"text_{split}_{cfg.plm_name}.npz")
        if os.path.exists(cache):
            z = np.load(cache)
            arrays = MeldTextArrays(z["ids"], z["mask"], z["sep"])
        else:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(
                cfg.pretrained_text_model_path or cfg.plm_name)
            prep = MeldTextPreprocessor(tok, is_roberta)
            feats = prep.preprocess_split(
                os.path.join(cfg.data.load_anno_csv_path,
                             f"{split}_sent_emo.csv"),
                os.path.join(cfg.data.meld_text_path, f"{split}_text.json"))
            ids, mask, sep = MeldTextPreprocessor.to_arrays(feats)
            np.savez(cache, ids=ids, mask=mask, sep=sep)
            arrays = MeldTextArrays(ids, mask, sep)
        return MeldMultimodalDataset(cfg.data.data_load_path, split, arrays,
                                     cfg.choice_modality)

    test_ds = build_split("test")
    cfg = _adapt_static_shapes(cfg, test_ds)

    if cfg.granularity == "dia":
        # appendix dialogue-level path (--uttORdia dia)
        from facialmmt_tpu.data.meld import MeldDialogueDataset
        from facialmmt_tpu.train.trainer import DialogueTrainer

        dia_trainer = DialogueTrainer(cfg, writer)
        dia_test = MeldDialogueDataset(test_ds)
        if cfg.do_eval:
            # reference (Appendix)CCAC2023/train.py:156-194: load best model,
            # predict test in order, fill the submission CSV + pred/true dump
            return dia_trainer.eval_dialogue_only(
                dia_test,
                ckpt_dir=args.load_best_model_path or None,
                submission_template=args.submission_template,
                submission_out=args.submission_out,
                pred_dump_path=args.pred_dump_path)
        dia_train = MeldDialogueDataset(build_split("train"))
        dia_valid = MeldDialogueDataset(build_split("val"))
        return dia_trainer.run_dialogue(dia_train, dia_valid, dia_test,
                                        resume=bool(args.resume))

    trainer = Trainer(cfg, writer)
    if cfg.do_eval:
        print("Evaluating on the test set directly...")
        params, batch_stats = load_torch_multimodal(
            cfg,
            os.path.join(args.pretrained_model_dir, cfg.load_multimodal_path),
            os.path.join(args.pretrained_model_dir, cfg.load_swin_path))
        return trainer.eval_multimodal_only(params, batch_stats, test_ds)

    print("Training from scratch...")
    train_ds = build_split("train")
    valid_ds = build_split("val")
    from facialmmt_tpu.data.affwild2 import AffwildDataset

    aux_ds = AffwildDataset(cfg.data.data_folder, cfg.data.anno_folder,
                            cfg.data.data_list_train)
    pretrained = None
    if cfg.pretrained_backbone_path and os.path.exists(
            cfg.pretrained_backbone_path):
        from facialmmt_tpu.checkpoint.torch_convert import (
            convert_pretrained_swin_backbone, load_torch_state_dict)

        pretrained = convert_pretrained_swin_backbone(
            load_torch_state_dict(cfg.pretrained_backbone_path), cfg)
    return trainer.run_multimodal(aux_ds, train_ds, valid_ds, test_ds,
                                  pretrained, resume=bool(args.resume))


if __name__ == "__main__":
    import sys

    from facialmmt_tpu.utils.preemption import Preempted

    try:
        run()
    except Preempted:
        # conventional SIGTERM exit code; the resume checkpoint is on disk
        sys.exit(143)
