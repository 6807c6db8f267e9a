from facialmmt_tpu.data.image_pipeline import (
    color_jitter, gaussian_blur, grayscale, normalize_images, random_erasing,
    resize_batch, affwild2_train_augment, meld_face_train_augment,
    meld_face_eval_transform)
from facialmmt_tpu.data.text_prep import (MeldTextPreprocessor, InputFeatures,
                                          truncate_seq_pair, make_text_dia)
