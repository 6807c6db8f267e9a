"""M3ED (appendix) dataset layer.

Text-only utterance-level dataset — the TPU rebuild of the appendix's
`loading_unimodal_text` (reference (Appendix)CCAC2023/utils/dataset.py:112-147):
one sample per utterance, text = the utterance's whole parent dialogue, label
read from the per-token label channel at the utterance's sep position.

TPU-first batching mirrors data/meld.py: unique dialogues are deduped per batch
(encode-once-gather-many) and every batch is static-shape.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


class M3edTextDataset:
    """Utterance-level text-only dataset over per-dialogue arrays.

    Arrays come from M3edTextPreprocessor.to_arrays (or any source with the
    same layout): input_ids/input_mask/sep_mask/label_ids all (num_dia, L).
    The utterance->dialogue profile the reference stores in
    {split}_utt_profile.json is derived here from the sep layout itself —
    utterance u of dialogue d is the u-th sep position of row d (reference
    utils/dataset.py:131-146 reads the same structure from the profile file).
    """

    def __init__(self, input_ids: np.ndarray, input_mask: np.ndarray,
                 sep_mask: np.ndarray, label_ids: np.ndarray):
        self.input_ids = np.asarray(input_ids, np.int32)
        self.input_mask = np.asarray(input_mask, np.int32)
        self.sep_mask = np.asarray(sep_mask, np.int32)
        self.label_ids = np.asarray(label_ids, np.int32)

        # per-utterance index: (dia_row, utt_in_dia_idx, label)
        self._dia_row = []
        self._utt_pos = []
        self._labels = []
        for d in range(self.sep_mask.shape[0]):
            sep_positions = np.nonzero(self.sep_mask[d])[0]
            for pos, sp in enumerate(sep_positions):
                self._dia_row.append(d)
                self._utt_pos.append(pos)
                self._labels.append(int(self.label_ids[d, sp]))
        self._dia_row = np.asarray(self._dia_row, np.int32)
        self._utt_pos = np.asarray(self._utt_pos, np.int32)
        self._labels = np.asarray(self._labels, np.int32)

    def __len__(self) -> int:
        return len(self._labels)

    def get_batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        """Static-shape batch in the multimodal layout (text keys only):
        B dialogue slots (deduped, pad-by-repeat), dia_idx gather vector."""
        idx = np.asarray(list(indices))
        b = len(idx)
        dia_slots: Dict[int, int] = {}
        dia_idx = np.zeros(b, np.int32)
        for j, i in enumerate(idx):
            d = int(self._dia_row[i])
            if d not in dia_slots:
                dia_slots[d] = len(dia_slots)
            dia_idx[j] = dia_slots[d]
        slot_to_dia = {v: k for k, v in dia_slots.items()}
        rows = [slot_to_dia.get(s, slot_to_dia[0]) for s in range(b)]
        return {
            "dia_input_ids": self.input_ids[rows],
            "dia_input_mask": self.input_mask[rows],
            "dia_sep_mask": self.sep_mask[rows],
            "dia_idx": dia_idx,
            "utt_in_dia_idx": self._utt_pos[idx],
            "labels": self._labels[idx],
        }
