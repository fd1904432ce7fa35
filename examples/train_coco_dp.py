"""Full COCO training with multi-scale 320-608 and data parallelism
(the reference's yolo_train notebook flow, scaled over a TPU slice).

    python examples/train_coco_dp.py --train-list coco/trainvalno5k.txt \
        --resume --bf16
"""

import argparse

import jax

from yolo_v3_tpu.data.datasets import ListDataset
from yolo_v3_tpu.data.loader import DataHelper
from yolo_v3_tpu.data.sampler import CyclicSampler
from yolo_v3_tpu.data import transforms as T
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.parallel import mesh as M
from yolo_v3_tpu.train.checkpoint import get_latest_checkpoint, load_checkpoint
from yolo_v3_tpu.train.loop import train
from yolo_v3_tpu.utils.config import TrainConfig, YoloConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-list", required=True)
    ap.add_argument("--model-id", default="coco")
    ap.add_argument("--weight-dir", default="weights")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--max-net-batches", type=int, default=500_200)
    args = ap.parse_args()

    cfg = YoloConfig(num_classes=80)
    tcfg = TrainConfig(
        batch_size=16, net_subdivisions=4,           # net batch 64
        lr=1e-3, backbone_lr=1e-4, weight_decay=5e-4, momentum=0.9,
        multi_scale=True,
        compute_dtype="bfloat16" if args.bf16 else "float32",
    )

    ds = ListDataset(args.train_list,
                     trans_fn=lambda dim: T.training_transform(dim))
    sampler = CyclicSampler(
        len(ds), tcfg.batch_size, seed=tcfg.seed, dim=None,
        rand_dim_interval=tcfg.batch_size * tcfg.net_subdivisions,
    )
    data = DataHelper(ds, sampler, max_net_batches=args.max_net_batches,
                      net_subdivisions=tcfg.net_subdivisions)

    params, state = D.init_yolonet(jax.random.PRNGKey(tcfg.seed),
                                   cfg.num_classes)
    checkpoint = None
    if args.resume:
        path, _ = get_latest_checkpoint(args.model_id, args.weight_dir)
        if path:
            print("resuming from", path)
            checkpoint = load_checkpoint(path)

    mesh = M.make_mesh() if len(jax.devices()) > 1 else None
    train(data, params, state, cfg, tcfg, model_id=args.model_id,
          weight_dir=args.weight_dir, checkpoint=checkpoint,
          checkpoint_interval=100, mesh=mesh)


if __name__ == "__main__":
    main()
