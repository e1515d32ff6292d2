# Shared DA-ZoeDepth branch hyperparameters (the reference inlines this
# block in every experiment config; here it is a _base_ that variant
# configs deep-merge over). Defaults = vitl.
min_depth = 1e-3
max_depth = 80

zoe_depth_config = dict(
    type="DA-ZoeDepth",
    min_depth=min_depth,
    max_depth=max_depth,
    depth_anything=True,
    midas_model_type="vitl",
    img_size=[392, 518],
    pretrained_resource=None,
    use_pretrained_midas=True,
    train_midas=True,
    freeze_midas_bn=True,
    do_resize=False,
    # metric-bins head
    attractor_alpha=1000,       # NOTE: effectively 300 — see
    attractor_gamma=2,          # models/zoedepth.py _attractor_dist
    attractor_kind="mean",
    attractor_type="inv",
    bin_centers_type="softplus",
    bin_embedding_dim=128,
    n_attractors=[16, 8, 4, 1],
    n_bins=64,
    min_temp=0.0212,
    max_temp=50.0,
    memory_efficient=True,
    inverse_midas=False,
)
