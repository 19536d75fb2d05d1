# CORAL stage 2 (UDLR sparse local refinement) on top of the DINOv2 stage-1
# model. The refiner re-infers high-entropy windows against high-res patch
# features and fuses with the coarse prediction.

_refiner = dict(
    window_size=3,  # 3x3 window grid
    window_length=56,  # per-window feature resolution
    threshold=0.0015,  # entropy selection gate
    ema_weight=0.70,
)

cfg = dict(
    _BASE_=["./UCOD-DPL_dinov2.py"],
    exp_name="CORAL_dinov2",
    start_ema=1,
    enable_plabel_cache=True,
    # short refinement schedule: 8 epochs, per-epoch StepLR halving every 2
    train_cfg=dict(step_lr_gamma=0.95, step_lr_size=2, lr0=1e-4, max_epoch=8),
    val_cfg=dict(val_start=4, val_interval=4),
    model_cfg=_refiner,
    dataset_cfg=dict(
        trainloader_cfg=dict(batch_size=2, num_workers=0, shuffle=True),
        valset_cfg=dict(
            DATASET="TE-CAMO",
            use_cache=True,
            require_m_patches=False,
        ),
        trainset_cfg=dict(
            image_size=(518, 518),
            require_label=True,
            look_twice=False,
            look_twice_th=0.15,
            bkg_th=0.6,
            use_cache=True,
            require_m_patches=True,
        ),
    ),
)
