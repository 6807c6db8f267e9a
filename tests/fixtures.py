"""Synthetic MELD/Aff-Wild2 fixtures: tiny on-disk datasets with the exact file
layout the reference consumes (pkls, jsons, csv, face jpgs), so the data layer
and the CLI can run end-to-end with no real data (SURVEY.md §4b)."""

import json
import os
import pickle

import numpy as np


class WhitespaceTokenizer:
    """Minimal tokenizer satisfying the text_prep interface."""

    def __init__(self, is_roberta=True):
        specials = (["<s>", "</s>", "<pad>"] if is_roberta
                    else ["[CLS]", "[SEP]", "[PAD]"])
        self.vocab = {t: i for i, t in enumerate(specials)}

    def tokenize(self, text):
        return text.split()

    def convert_tokens_to_ids(self, tokens):
        for t in tokens:
            if t not in self.vocab:
                self.vocab[t] = len(self.vocab)
        return [self.vocab[t] for t in tokens]


def write_meld_fixture(root, split="test", num_dia=3, utts_per_dia=3,
                       audio_len=12, vision_len=6, audio_dim=24,
                       vision_dim=16, face_size=160, seed=0,
                       modality="T+A+V", faces_per_utt=2):
    """Create the full on-disk layout for one split.  Returns dict of paths."""
    rng = np.random.default_rng(seed)
    base = os.path.join(root, modality)
    os.makedirs(base, exist_ok=True)
    n_utt = num_dia * utts_per_dia

    audio = rng.normal(size=(n_utt, audio_len, audio_dim)).astype(np.float32)
    audio_mask = np.zeros((n_utt, audio_len), np.int64)
    for i in range(n_utt):
        audio_mask[i, :int(rng.integers(1, audio_len + 1))] = 1
    with open(os.path.join(base, f"meld_{split}_audio_utt.pkl"), "wb") as f:
        pickle.dump({split: {"audio": audio, "audio_utt_mask": audio_mask}}, f)

    vision = rng.normal(size=(n_utt, vision_len, vision_dim)).astype(np.float32)
    vision_mask = np.zeros((n_utt, vision_len), np.int64)
    labels = rng.integers(0, 7, size=n_utt)
    profile = {}
    face_paths = {}
    face_dir = os.path.join(root, "faces")
    os.makedirs(face_dir, exist_ok=True)
    import cv2

    for i in range(n_utt):
        dia = i // utts_per_dia
        pos = i % utts_per_dia
        name = f"dia{dia}_utt{pos}"
        profile[str(i)] = [name, f"dia{dia}", dia, utts_per_dia, pos]
        n_faces = int(rng.integers(1, faces_per_utt + 1))
        vision_mask[i, :n_faces] = 1
        paths = []
        for k in range(n_faces):
            img = rng.integers(0, 255, size=(face_size, face_size, 3),
                               dtype=np.uint8)
            p = os.path.join(face_dir, f"{name}_{k}.jpg")
            cv2.imwrite(p, img)
            paths.append(p)
        face_paths[name] = paths
    with open(os.path.join(base, f"meld_{split}_vision_utt.pkl"), "wb") as f:
        pickle.dump({split: {"vision": vision, "vision_utt_mask": vision_mask,
                             "labels": labels}}, f)
    with open(os.path.join(base, f"{split}_utt_profile.json"), "w") as f:
        json.dump(profile, f)
    with open(os.path.join(base, f"{split}_facseqs_160_paths_final.json"),
              "w") as f:
        json.dump(face_paths, f)

    # unimodal V layout
    vbase = os.path.join(root, "V")
    os.makedirs(vbase, exist_ok=True)
    with open(os.path.join(vbase, f"meld_{split}_vision_utt.pkl"), "wb") as f:
        pickle.dump({split: {"vision": vision, "vision_utt_mask": vision_mask,
                             "labels": labels}}, f)

    # csv + text json for the text pipeline
    csv_path = os.path.join(root, f"{split}_sent_emo.csv")
    with open(csv_path, "w") as f:
        f.write("Dialogue_ID,Utterance_ID,Utterance\n")
        for i in range(n_utt):
            f.write(f"{i // utts_per_dia},{i % utts_per_dia},utt {i}\n")
    text_json = os.path.join(root, f"{split}_text.json")
    with open(text_json, "w") as f:
        json.dump({profile[str(i)][0]: {"txt": [f"hello utt {i} word"]}
                   for i in range(n_utt)}, f)

    return {"base": base, "csv": csv_path, "text_json": text_json,
            "n_utt": n_utt, "num_dia": num_dia, "labels": labels}


def write_affwild_fixture(root, num_videos=2, frames=5, img_size=112, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    file_folder = os.path.join(root, "cropped_aligned")
    anno_folder = os.path.join(root, "annos")
    os.makedirs(anno_folder, exist_ok=True)
    for v in range(num_videos):
        vdir = os.path.join(file_folder, f"vid{v}")
        os.makedirs(vdir, exist_ok=True)
        with open(os.path.join(anno_folder, f"vid{v}.txt"), "w") as f:
            f.write("Neutral,Anger,Disgust,Fear,Happiness,Sadness,Surprise,Other\n")
            for i in range(1, frames + 1):
                label = int(rng.integers(-1, 8))
                f.write(f"{label}\n")
                img = rng.integers(0, 255, (img_size, img_size, 3),
                                   dtype=np.uint8)
                cv2.imwrite(os.path.join(vdir, f"{str(i).zfill(5)}.jpg"), img)
    return {"file_folder": file_folder, "anno_folder": anno_folder}


def write_m3ed_text_fixture(root, split="train", num_dia=3, utts_per_dia=3,
                            seed=0):
    """{split}_utt_text_noEmo.json in the M3ED layout the appendix consumes:
    {dia_id: {utt_id: {'text': str, 'label': int}}}."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    annot = {}
    for d in range(num_dia):
        dia = {}
        for u in range(utts_per_dia):
            n_words = int(rng.integers(2, 6))
            dia[f"utt{u}"] = {
                "text": " ".join(f"w{int(rng.integers(0, 40))}"
                                 for _ in range(n_words)),
                "label": int(rng.integers(0, 7)),
            }
        annot[f"dia{d}"] = dia
    path = os.path.join(root, f"{split}_utt_text_noEmo.json")
    with open(path, "w", encoding="utf8") as f:
        json.dump(annot, f)
    return {"path": path, "annot": annot,
            "n_utt": num_dia * utts_per_dia}


def write_m3ed_multimodal_fixture(root, split="train", num_dia=3,
                                  utts_per_dia=3, audio_len=10, vision_len=7,
                                  audio_dim=20, vision_dim=12, seed=0):
    """Full M3ED on-disk layout (reference (Appendix)CCAC2023/utils/
    dataset.py:165-302): {split}_utt_text_noEmo.json, utterance-level AND
    dialogue-level audio/vision pickles, utt profile + num_utt_in_dia jsons."""
    rng = np.random.default_rng(seed)
    text = write_m3ed_text_fixture(root, split, num_dia, utts_per_dia,
                                   seed=seed)
    n_utt = num_dia * utts_per_dia
    labels_utt = rng.integers(0, 7, size=n_utt)

    audio = rng.normal(size=(n_utt, audio_len, audio_dim)).astype(np.float32)
    audio_mask = np.zeros((n_utt, audio_len), np.int64)
    vision = rng.normal(size=(n_utt, vision_len, vision_dim)).astype(np.float32)
    vision_mask = np.zeros((n_utt, vision_len), np.int64)
    profile = {}
    for i in range(n_utt):
        audio_mask[i, :int(rng.integers(1, audio_len + 1))] = 1
        vision_mask[i, :int(rng.integers(1, vision_len + 1))] = 1
        d, u = i // utts_per_dia, i % utts_per_dia
        profile[str(i)] = [f"dia{d}_utt{u}", f"dia{d}", d, utts_per_dia, u]

    with open(os.path.join(root, f"m3ed_{split}_audio_utt.pkl"), "wb") as f:
        pickle.dump({split: {"audio": audio, "audio_utt_mask": audio_mask,
                             "labels": labels_utt}}, f)
    with open(os.path.join(root, f"m3ed_{split}_vision_utt.pkl"), "wb") as f:
        pickle.dump({split: {"vision": vision,
                             "vision_utt_mask": vision_mask}}, f)
    with open(os.path.join(root, f"{split}_utt_profile.json"), "w") as f:
        json.dump(profile, f)

    # dialogue-level 4-D layout
    audio_d = audio.reshape(num_dia, utts_per_dia, audio_len, audio_dim)
    audio_mask_d = audio_mask.reshape(num_dia, utts_per_dia, audio_len)
    vision_d = vision.reshape(num_dia, utts_per_dia, vision_len, vision_dim)
    vision_mask_d = vision_mask.reshape(num_dia, utts_per_dia, vision_len)
    dia_mask = np.ones((num_dia, utts_per_dia), np.int64)
    labels_d = labels_utt.reshape(num_dia, utts_per_dia)
    with open(os.path.join(root, f"m3ed_{split}_audio_dia.pkl"), "wb") as f:
        pickle.dump({split: {"audio": audio_d,
                             "audio_utt_mask": audio_mask_d,
                             "audio_dia_mask": dia_mask,
                             "labels": labels_d}}, f)
    with open(os.path.join(root, f"m3ed_{split}_vision_dia.pkl"), "wb") as f:
        pickle.dump({split: {"vision": vision_d,
                             "vision_utt_mask": vision_mask_d,
                             "vision_dia_mask": dia_mask}}, f)
    with open(os.path.join(root, f"{split}_num_utt_in_dia.json"), "w") as f:
        json.dump({str(d): utts_per_dia for d in range(num_dia)}, f)

    return {"root": root, "n_utt": n_utt, "num_dia": num_dia,
            "labels_utt": labels_utt, "labels_dia": labels_d,
            "audio": audio, "vision": vision, "text": text}
