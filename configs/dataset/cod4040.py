# COD dataset roots. Split names follow the standard RefCOD layout:
# TR-* are training splits, TE-* / CHAMELEON / NC4K are test sets, each with
# im/ (RGB) and gt/ (binary mask) subdirectories.

cfg = dict(
    dataset_cfg=dict(
        dataset_dir="./datasets/RefCOD",
        cache_dir="./datasets/cache/look_twice",
        trainset_cfg=dict(
            DATASET="TR-CAMO+TR-COD10K",
            require_label=False,
        ),
        valset_cfg=dict(
            DATASET="TE-COD10K",
            require_label=True,
        ),
    ),
)
