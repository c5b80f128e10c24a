from kindergarten_vq_vae_tpu.ckpt.checkpoint import (
    best_ckpt_name,
    save_checkpoint,
    save_checkpoint_multi,
    restore_checkpoint,
    save_train_state,
    restore_train_state,
    load_bagon_into_model,
)
