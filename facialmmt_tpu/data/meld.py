"""MELD dataset loading + static-shape batch assembly.

Rebuild of the reference's dataset layer (reference utils/dataset.py:160-307):
  * precomputed audio (wav2vec2, 768-d) and vision (InceptionResnet, 512-d)
    utterance feature pickles with masks and labels;
  * {split}_utt_profile.json mapping utt index -> [utt_name, dia_name, dia_idx,
    dia_len, utt_in_dia_idx] (reference utils/dataset.py:254-261);
  * {split}_facseqs_160_paths_final.json mapping utt_name -> face-crop paths;
  * dialogue text features from data/text_prep.py (cached as npz).

TPU-first batching (vs the reference's bs=1 DataLoader):
  * every batch is STATIC-SHAPE: B utterances, B dialogue slots (unique
    dialogues deduped and gathered via dia_idx — encode-once-gather-many,
    SURVEY.md §3.1), and a fixed face capacity N with packed real faces
    (face_utt_id / face_pos slot maps; -1 pads);
  * the host only DECODES jpegs (cv2, BGR order preserved — the reference feeds
    BGR-as-RGB, utils/dataset.py:59, and released checkpoints expect it); all
    resize/augment/normalize runs batched on device (data/image_pipeline.py);
  * face lists longer than vision_utt_max_len truncate (reference :278-279).
"""

from __future__ import annotations

import json
import os
import pickle
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

RAW_FACE_SIZE = 160  # MELD face crops are 160px (reference README.md:116)


class FaceCapacityError(ValueError):
    """A batch needs more packed-face slots than the static buffer provides.

    The reference processes EVERY face up to the per-utterance cap (reference
    train.py:60-71); silently dropping trailing faces would scatter zero FER
    probs and diverge from it invisibly (VERDICT r2 weak #2).  Carries
    `required`, the slot count this batch actually needs, so callers can
    escalate to a larger static bucket (train/trainer.py does)."""

    def __init__(self, required: int, capacity: int, split: str = ""):
        self.required = required
        self.capacity = capacity
        super().__init__(
            f"face-packing overflow{f' ({split})' if split else ''}: batch "
            f"needs {required} face slots but face_capacity={capacity}; "
            f"escalate the capacity bucket or lower the batch size")


def _load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def _cached_arrays(cache_path: str, sources: Sequence[str], build):
    """Whole-dataset cache (reference utils/util.py:90-115 caches fully
    preprocessed datasets to .dt torch pickles; here: one npz per split).

    `build()` returns a dict[str, np.ndarray]; the npz is rebuilt whenever any
    source file is newer than the cache.  Parsing the reference's pickles goes
    through np.asarray over python lists — the slow step this removes on every
    run after the first."""
    try:
        cache_mtime = os.path.getmtime(cache_path)
        if all(os.path.getmtime(s) <= cache_mtime for s in sources):
            with np.load(cache_path) as z:
                return {k: z[k] for k in z.files}
    except (OSError, ValueError):
        pass
    arrays = build()
    try:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        tmp = cache_path + ".tmp.npz"  # savez appends .npz unless present
        np.savez(tmp, **arrays)
        os.replace(tmp, cache_path)
    except OSError:
        pass  # read-only data dir: run uncached
    return arrays


@dataclass
class MeldTextArrays:
    input_ids: np.ndarray   # (num_dia, 512)
    input_mask: np.ndarray  # (num_dia, 512)
    sep_mask: np.ndarray    # (num_dia, 512)


class MeldVisionDataset:
    """Unimodal V split (reference utils/dataset.py:160-189):
    V/meld_{split}_vision_utt.pkl -> features, masks, labels."""

    def __init__(self, data_load_path: str, split: str, cache: bool = True):
        path = os.path.join(data_load_path, "V",
                            f"meld_{split}_vision_utt.pkl")

        def build():
            data = _load_pickle(path)[split]
            return {
                "vision": np.asarray(data["vision"], np.float32),
                "vision_mask": np.asarray(data["vision_utt_mask"], np.int32),
                "labels": np.asarray(data["labels"], np.int64),
            }

        arrays = (_cached_arrays(path + ".npz", [path], build)
                  if cache else build())
        self.features = arrays["vision"]
        self.mask = arrays["vision_mask"]
        self.labels = arrays["labels"]

    def __len__(self):
        return self.features.shape[0]

    @property
    def max_utt_len(self):
        return self.features.shape[1]

    @property
    def feat_dim(self):
        return self.features.shape[-1]

    def get_batch(self, indices: Sequence[int]):
        idx = np.asarray(indices)
        return {
            "feats": self.features[idx],
            "mask": self.mask[idx],
            "labels": self.labels[idx],
        }


class MeldMultimodalDataset:
    """T+A+V split: text arrays + audio/vision pickles + face sequences."""

    def __init__(self, data_load_path: str, split: str,
                 text_arrays: MeldTextArrays,
                 choice_modality: str = "T+A+V",
                 face_root: str = "",
                 load_faces: bool = True,
                 cache: bool = True):
        base = os.path.join(data_load_path, choice_modality)
        self.split = split
        self.text = text_arrays
        self.load_faces = load_faces
        self.face_root = face_root

        audio_pkl = os.path.join(base, f"meld_{split}_audio_utt.pkl")
        vision_pkl = os.path.join(base, f"meld_{split}_vision_utt.pkl")

        def build():
            audio = _load_pickle(audio_pkl)[split]
            vision = _load_pickle(vision_pkl)[split]
            return {
                "audio": np.asarray(audio["audio"], np.float32),
                "audio_mask": np.asarray(audio["audio_utt_mask"], np.int32),
                "vision": np.asarray(vision["vision"], np.float32),
                "vision_mask": np.asarray(vision["vision_utt_mask"], np.int32),
                "labels": np.asarray(vision["labels"], np.int64),
            }

        arrays = (_cached_arrays(
            os.path.join(base, f"meld_{split}_features.npz"),
            [audio_pkl, vision_pkl], build) if cache else build())
        self.audio = arrays["audio"]
        self.audio_mask = arrays["audio_mask"]
        self.vision = arrays["vision"]
        self.vision_mask = arrays["vision_mask"]
        self.labels = arrays["labels"]

        with open(os.path.join(base, f"{split}_utt_profile.json"),
                  encoding="utf8") as f:
            self.utt_profile = json.load(f)
        with open(os.path.join(base,
                               f"{split}_facseqs_160_paths_final.json"),
                  encoding="utf8") as f:
            self.utt_face_path = json.load(f)
        self._check_face_mask_consistency()

    def _check_face_mask_consistency(self):
        """The reference drives Swin input off the face-path counts and the
        filter fallback off the pkl vision mask, silently assuming they agree
        (reference train.py:60-71 vs :122-133).  Assert that assumption loudly
        at load time so a disagreeing dataset can't drift parity."""
        f_max = self.vision.shape[1]
        mask_counts = self.vision_mask.sum(axis=1)
        bad = []
        for i_str, prof in self.utt_profile.items():
            name = prof[0]
            n_paths = min(len(self.utt_face_path.get(name, [])), f_max)
            if n_paths != int(mask_counts[int(i_str)]):
                bad.append((name, n_paths, int(mask_counts[int(i_str)])))
        if bad:
            head = ", ".join(f"{n}: {p} paths vs mask {m}"
                             for n, p, m in bad[:5])
            raise ValueError(
                f"{self.split}: face-path counts disagree with the pkl "
                f"vision mask for {len(bad)} utterance(s) ({head}) — the "
                f"reference assumes these are equal (train.py:60-133)")

    def __len__(self):
        return self.vision.shape[0]

    @property
    def audio_max_utt_len(self):
        return self.audio.shape[1]

    @property
    def vision_max_utt_len(self):
        return self.vision.shape[1]

    @property
    def audio_feat_dim(self):
        return self.audio.shape[-1]

    @property
    def vision_feat_dim(self):
        return self.vision.shape[-1]

    def _decode_faces(self, paths: List[str]) -> np.ndarray:
        """Host-side decode only.  BGR order preserved (see module docstring);
        odd-sized crops are host-resized to the canonical 160 so the device
        pipeline sees one static shape.

        Fast path: the native C++ thread-pool loader (facialmmt_tpu/native);
        falls back to per-image cv2 when the toolchain is unavailable."""
        full = [os.path.join(self.face_root, r) if self.face_root else r
                for r in paths]
        from facialmmt_tpu.native import decode_resize_batch

        native = decode_resize_batch(full, RAW_FACE_SIZE)
        if native is not None:
            return native

        import cv2

        out = np.zeros((len(paths), RAW_FACE_SIZE, RAW_FACE_SIZE, 3), np.uint8)
        for i, p in enumerate(full):
            im = cv2.imread(p)
            if im is None:
                continue
            if im.shape[:2] != (RAW_FACE_SIZE, RAW_FACE_SIZE):
                interp = (cv2.INTER_AREA if im.shape[0] > RAW_FACE_SIZE
                          else cv2.INTER_CUBIC)
                im = cv2.resize(im, (RAW_FACE_SIZE, RAW_FACE_SIZE),
                                interpolation=interp)
            out[i] = im
        return out

    def get_batch(self, indices: Sequence[int], face_capacity: int):
        """Assemble one static-shape batch.

        Returns numpy dict matching models/pipeline.py's layout, with
        'faces_raw' as (face_capacity, 160, 160, 3) uint8 — run the device
        augment (data/image_pipeline.py) and swap in as 'faces'.
        """
        idx = list(indices)
        b = len(idx)
        f_max = self.vision_max_utt_len

        # --- dedup dialogues (encode-once-gather-many) ---
        dia_slots: Dict[int, int] = {}
        dia_idx = np.zeros(b, np.int32)
        utt_in_dia_idx = np.zeros(b, np.int32)
        utt_names = []
        for j, i in enumerate(idx):
            prof = self.utt_profile[str(i)]
            utt_name, _dia_name, dia_i, _dia_len, utt_pos = prof
            utt_names.append(utt_name)
            if dia_i not in dia_slots:
                dia_slots[dia_i] = len(dia_slots)
            dia_idx[j] = dia_slots[dia_i]
            utt_in_dia_idx[j] = utt_pos
        slot_to_dia = {v: k for k, v in dia_slots.items()}
        # B dialogue slots, pad-by-repeat keeps shapes static
        dia_rows = [slot_to_dia.get(s, slot_to_dia[0]) for s in range(b)]
        ids = self.text.input_ids[dia_rows]
        imask = self.text.input_mask[dia_rows]
        sep = self.text.sep_mask[dia_rows]

        # --- pack faces (every face up to the per-utt cap, like the
        # reference train.py:60-71; overflow raises, never silently drops) ---
        needed = sum(min(len(self.utt_face_path.get(n, [])), f_max)
                     for n in utt_names)
        if needed > face_capacity:
            raise FaceCapacityError(needed, face_capacity, self.split)
        n_faces = np.zeros(b, np.int32)
        face_utt_id = np.full(face_capacity, -1, np.int32)
        face_pos = np.zeros(face_capacity, np.int32)
        face_paths: List[Optional[str]] = []
        cursor = 0
        for j, name in enumerate(utt_names):
            paths = self.utt_face_path.get(name, [])[:f_max]
            take = len(paths)
            n_faces[j] = take
            for t in range(take):
                face_utt_id[cursor] = j
                face_pos[cursor] = t
                face_paths.append(paths[t])
                cursor += 1
        if self.load_faces:
            decoded = self._decode_faces(face_paths)
            faces_raw = np.zeros((face_capacity, RAW_FACE_SIZE, RAW_FACE_SIZE, 3),
                                 np.uint8)
            faces_raw[:cursor] = decoded
        else:
            faces_raw = np.zeros((face_capacity, RAW_FACE_SIZE, RAW_FACE_SIZE, 3),
                                 np.uint8)

        return {
            "dia_input_ids": ids,
            "dia_input_mask": imask,
            "dia_sep_mask": sep,
            "dia_idx": dia_idx,
            "utt_in_dia_idx": utt_in_dia_idx,
            "audio_inputs": self.audio[idx],
            "audio_mask": self.audio_mask[idx],
            "vision_feats": self.vision[idx],
            "vision_mask": self.vision_mask[idx],
            "n_faces": n_faces,
            "faces_raw": faces_raw,
            "face_utt_id": face_utt_id,
            "face_pos": face_pos,
            "labels": self.labels[idx].astype(np.int32),
        }


class MeldDialogueDataset:
    """Dialogue-level batching (appendix A6, reference
    (Appendix)CCAC2023/utils/dataset.py:154-302).

    The appendix consumes precomputed (num_dia, max_dia_len, max_utt_len, dim)
    pickles; here dialogues are assembled by grouping the utterance-level
    arrays via utt_profile — same batch layout, one data format.  One sample =
    one dialogue: audio/vision (D, L, feat), dia_mask (D,), labels (D,).
    """

    def __init__(self, base: MeldMultimodalDataset, max_dia_len: int = 0):
        self.base = base
        # dialogue -> ordered utterance indices
        groups: Dict[int, List[int]] = {}
        for idx_str, prof in base.utt_profile.items():
            _, _, dia_i, _, utt_pos = prof
            groups.setdefault(dia_i, {})[utt_pos] = int(idx_str)
        self.dialogues = [
            [groups[d][p] for p in sorted(groups[d])]
            for d in sorted(groups)
        ]
        self.max_dia_len = max_dia_len or max(len(d) for d in self.dialogues)
        # map dialogue order -> text array row (dia_idx from the profile)
        self.dia_rows = sorted(groups)

    def __len__(self):
        return len(self.dialogues)

    def get_batch(self, indices: Sequence[int]):
        idx = list(indices)
        b = len(idx)
        d_max = self.max_dia_len
        la, da = self.base.audio.shape[1:]
        lv, dv = self.base.vision.shape[1:]

        audio = np.zeros((b, d_max, la, da), np.float32)
        audio_mask = np.zeros((b, d_max, la), np.int32)
        vision = np.zeros((b, d_max, lv, dv), np.float32)
        vision_mask = np.zeros((b, d_max, lv), np.int32)
        dia_mask = np.zeros((b, d_max), np.int32)
        labels = np.zeros((b, d_max), np.int32)
        for j, di in enumerate(idx):
            utts = self.dialogues[di][:d_max]
            n = len(utts)
            audio[j, :n] = self.base.audio[utts]
            audio_mask[j, :n] = self.base.audio_mask[utts]
            vision[j, :n] = self.base.vision[utts]
            vision_mask[j, :n] = self.base.vision_mask[utts]
            dia_mask[j, :n] = 1
            labels[j, :n] = self.base.labels[utts]

        rows = [self.dia_rows[di] for di in idx]
        return {
            "dia_input_ids": self.base.text.input_ids[rows],
            "dia_input_mask": self.base.text.input_mask[rows],
            "dia_sep_mask": self.base.text.sep_mask[rows],
            "audio_inputs": audio,
            "audio_mask": audio_mask,
            "vision_inputs": vision,
            "vision_mask": vision_mask,
            "dia_mask": dia_mask,
            "labels": labels,
        }
