# Runtime defaults (reference configs/_base_/run_time.py; the distributed
# backend is the JAX runtime instead of NCCL).
env_cfg = dict(
    mp_cfg=dict(mp_start_method="forkserver"),
    dist_cfg=dict(backend="jax"))
log_interval = 100
