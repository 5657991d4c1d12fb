"""Flow-only EPE of the flow net on KITTI2015/2012
(parity: /root/reference/test_back2future.py)."""
from __future__ import annotations

import argparse

import numpy as np

parser = argparse.ArgumentParser(
    description="Flow-net-only EPE evaluation",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter)
parser.add_argument("--kitti-dir", required=True)
parser.add_argument("--flownet", default="Back2Future")
parser.add_argument("--nlevels", type=int, default=6)
parser.add_argument("--pretrained-flow", required=True)
parser.add_argument("--dataset", default="kitti2015",
                    choices=["kitti2015", "kitti2012"])
parser.add_argument("-N", type=int, default=200,
                    help="number of KITTI2015 samples (reference hardcodes "
                         "200; smaller values allow partial trees)")


def main(argv=None):
    args = parser.parse_args(argv)
    import jax
    import jax.numpy as jnp
    from cc_tpu.cli.test_disp import load_net_params
    from cc_tpu.data import transforms
    from cc_tpu.data.validation import (ValidationFlow,
                                        ValidationFlowKitti2012)
    from cc_tpu.losses import compute_all_epes
    from cc_tpu.utils.logging import AverageMeter

    flow_net, flow_vars = load_net_params(args.pretrained_flow, args.flownet,
                                          nlevels=args.nlevels)
    tf = transforms.valid_flow_transform(256, 832)
    if args.dataset == "kitti2015":
        val_set = ValidationFlow(root=args.kitti_dir, sequence_length=5,
                                 transform=tf, N=args.N)
    else:
        val_set = ValidationFlowKitti2012(root=args.kitti_dir, transform=tf)

    @jax.jit
    def fwd(tgt, refs):
        if args.flownet == "Back2Future":
            f, _, _ = flow_net.apply(
                flow_vars, tgt, [refs[:, i] for i in range(refs.shape[1])],
                training=False)
        else:
            f = flow_net.apply(flow_vars, tgt, refs[:, -1], training=False)
        return f

    errors = AverageMeter(i=4)
    for i in range(len(val_set)):
        s = val_set[i]
        if args.dataset == "kitti2015":
            refs = s["refs"][1:3]
        else:
            refs = np.stack([s["ref"], s["ref"]])
        flow_fwd = fwd(jnp.asarray(s["tgt"][None]), jnp.asarray(refs[None]))
        flow_gt = s["flow_gt"][None]
        obj = s.get("obj_map", np.ones(flow_gt.shape[1:3], np.float32))
        obj = obj[None][..., None]
        errors.update(compute_all_epes(flow_gt, flow_fwd, flow_fwd,
                                       1.0 - obj))

    print("Average EPE [epe_total, epe_rigid, epe_non_rigid, outliers]:",
          errors.avg)
    return errors.avg


if __name__ == "__main__":
    main()
