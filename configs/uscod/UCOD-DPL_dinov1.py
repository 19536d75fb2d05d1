# Stage-1 UCOD-DPL with the DINOv1 (dino-vitb8) backbone.
# Differs from the v2 config in: lr (6e-4), eval resolution (296px),
# LookTwice gate (0.05), and the pseudo-label threshold (0.3).

_optim = dict(
    lr0=6e-4,
    dis_lr0=1e-3,
    step_lr_size=25,
    step_lr_gamma=0.95,
    dis_step_lr_size=25,
    dis_step_lr_gamma=0.95,
)

_schedule = dict(
    max_epoch=25,
    start_epoch=0,
    dis_epoch=1,
    dis_intertrain=2,
)

_backbone = dict(
    type="dinov1",
    backbone="facebook/dino-vitb8",
    backbone_type="huggingface",
    backbone_weights="./weights",
    backbone_weight_base="~/workspace/weights/huggingface",
    backbone_feat_dim=[768],
)

cfg = dict(
    _BASE_=[
        "../__base__/tpu.py",
        "../__base__/newbase.py",
        "../dataset/cod4040.py",
    ],
    exp_name="UCOD-DPL_dinov1",
    train_cfg={**_schedule, **_optim},
    val_cfg=dict(
        look_twice=True,
        look_twice_th=0.05,
        expand_type="dynamic",
        val_interval=5,
        val_start=5,
    ),
    log_cfg=dict(log_interval=50),
    model_cfg=dict(
        dim=768,
        feature_size=68,
        ema_weight=0.99,
        dis_use_features=False,
    ),
    dataset_cfg=dict(
        cache_dir="./datasets/cache",
        feature_extractor_cfg=_backbone,
        valset_cfg=dict(
            DATASET="TE-CAMO",
            image_size=(296, 296),
            require_label=True,
        ),
        trainset_cfg=dict(
            DATASET="TR-CAMO+TR-COD10K",
            image_size=(296, 296),
            require_label=False,
            bkg_th=0.3,
        ),
        trainloader_cfg=dict(batch_size=16, num_workers=0, shuffle=True),
        val_loader_cfg=dict(batch_size=1, num_workers=0, shuffle=False),
    ),
)
