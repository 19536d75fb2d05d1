# CORAL stage 2 (UDLR sparse local refinement) on top of the DINOv1 stage-1
# model. See CORAL_dinov2.py; v1 runs at 296px with lr 2e-4.

_refiner = dict(
    window_size=3,
    window_length=56,
    threshold=0.0015,
    ema_weight=0.70,
)

cfg = dict(
    _BASE_=["./UCOD-DPL_dinov1.py"],
    exp_name="CORAL_dinov1",
    start_ema=1,
    enable_plabel_cache=True,
    # short refinement schedule: 8 epochs, per-epoch StepLR halving every 2
    train_cfg=dict(step_lr_gamma=0.95, step_lr_size=2, lr0=2e-4, max_epoch=8),
    val_cfg=dict(val_start=4, val_interval=4),
    model_cfg=_refiner,
    dataset_cfg=dict(
        trainloader_cfg=dict(batch_size=2, num_workers=0, shuffle=True),
        valset_cfg=dict(use_cache=True, require_m_patches=True),
        trainset_cfg=dict(
            image_size=(296, 296),
            require_label=True,
            look_twice=False,
            look_twice_th=0.15,
            bkg_th=0.6,
            use_cache=True,
            require_m_patches=True,
        ),
    ),
)
