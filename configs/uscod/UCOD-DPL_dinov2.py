# Stage-1 UCOD-DPL with the DINOv2-base backbone.
#
# Hyperparameters reproduce the published CVPR-2025 configuration so the
# shipped checkpoints evaluate at their reported metrics. Sections are built
# as named blocks below and assembled into the `cfg` dict the loader expects.

_optim = dict(
    lr0=2e-4,  # decoder AdamW
    dis_lr0=1e-3,  # discriminator AdamW
    step_lr_size=25,  # per-batch StepLR period
    step_lr_gamma=0.95,
    dis_step_lr_size=25,
    dis_step_lr_gamma=0.95,
)

_schedule = dict(
    max_epoch=25,
    start_epoch=0,
    dis_epoch=1,  # discriminator passes per inter-training round
    dis_intertrain=2,  # inter-train the discriminator every N epochs
)

_looktwice = dict(
    look_twice=True,
    look_twice_th=0.15,  # largest-component area gate
    expand_type="dynamic",  # sqrt(2 - br/fr) bbox growth
)

_backbone = dict(
    type="dinov2",
    backbone="facebook/dinov2-base",
    backbone_type="huggingface",
    backbone_weights="./weights",
    backbone_weight_base="~/workspace/weights/huggingface",
    backbone_feat_dim=[768],
)

_loaders = dict(
    trainloader_cfg=dict(batch_size=16, num_workers=0, shuffle=True),
    val_loader_cfg=dict(batch_size=1, num_workers=0, shuffle=False),
)

cfg = dict(
    _BASE_=[
        "../__base__/tpu.py",
        "../__base__/newbase.py",
        "../dataset/cod4040.py",
    ],
    exp_name="UCOD-DPL_dinov2",
    train_cfg={**_schedule, **_optim},
    val_cfg={**_looktwice, "val_interval": 5, "val_start": 5},
    log_cfg=dict(log_interval=50),
    model_cfg=dict(
        dim=768,
        feature_size=68,  # decoder input grid
        ema_weight=0.99,
        dis_use_features=False,
    ),
    dataset_cfg=dict(
        cache_dir="./datasets/cache",
        feature_extractor_cfg=_backbone,
        valset_cfg=dict(
            DATASET="TE-CAMO",
            image_size=(518, 518),
            require_label=True,
        ),
        trainset_cfg=dict(
            DATASET="TR-CAMO+TR-COD10K",
            image_size=(518, 518),
            require_label=False,
            bkg_th=0.6,  # pseudo-label cosine threshold
        ),
        **_loaders,
    ),
)
