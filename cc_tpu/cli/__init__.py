"""Command-line entry points (python -m cc_tpu.cli.<name>), mirroring the
reference's CLI surface: train, test_disp, test_pose, test_flow, test_mask,
test_back2future, run_inference, submit_flow, evaluate_flow,
prepare_train_data, mnist."""
import os as _os

# Restore standard JAX_PLATFORMS env-var semantics. Some environments pin
# the platform list via jax.config in sitecustomize (e.g. a remote-TPU
# plugin), which silently BEATS the env var — a CLI invoked with
# JAX_PLATFORMS=cpu would then run (and populate compile caches) on the
# TPU profile, poisoning CPU cache dirs with host-incompatible AOT entries.
# Applying the env var through jax.config here (before any backend
# initializes) makes the documented contract hold for every cc_tpu CLI.
if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
