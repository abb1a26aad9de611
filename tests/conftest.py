"""Test config: force CPU with 8 virtual devices so sharding tests run
anywhere (SURVEY.md section 4 test strategy, item d).

Note: this environment pins JAX_PLATFORMS=axon (TPU tunnel); the env var
cannot be overridden after plugin registration, but jax.config can.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


# Tests measured >=15s on the reference box (full suite ~19-24 min; the
# fast tier `-m "not slow"` runs in a few minutes for the iterate loop).
# Auto-marked here so the tier has one source of truth.
SLOW_TESTS = {
    "test_lpips_distance_pallas_parity",
    "test_sharded_step_matches_single_device",
    "test_object_training_improves",
    "test_two_process_distributed_step",
    "test_composite_finetune_recovers_perturbation",
    "test_hand_training_improves",
    "test_object_training_with_densify",
    "test_xla_matches_oracle_gradients",
    "test_viewspace_grad_signal_scaling",
    "test_cli_training_artifacts",
    "test_lpips_wired_into_training",
    "test_pallas_matches_xla_gradients",
    "test_pallas_saturated_tile_early_exit_grads",
    "test_saturation_early_termination_semantics",
    "test_heldout_validation_and_artifacts",
    "test_adam_matches_torch_reference",
    "test_trainable_skin_weights",
    "test_pallas_clustered_scene_empty_programs",
    "test_non_tile_aligned_resolution",
    "test_cli_composite_finetune",
    "test_compute_losses_pallas_backend",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >=15s on the reference box; skip with -m 'not slow'"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.originalname in SLOW_TESTS or item.name in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
