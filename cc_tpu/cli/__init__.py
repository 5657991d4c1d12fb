"""Command-line entry points (python -m cc_tpu.cli.<name>), mirroring the
reference's CLI surface: train, test_disp, test_pose, test_flow, test_mask,
test_back2future, run_inference, submit_flow, evaluate_flow,
prepare_train_data, mnist."""
