import sys, numpy as np, cv2, jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from yolo_v3_tpu.detector import Detector
from yolo_v3_tpu.train.checkpoint import load_checkpoint
from yolo_v3_tpu.utils import chiplock
from yolo_v3_tpu.utils.config import YoloConfig
chiplock.acquire("probe_c80_det")
cfg = YoloConfig(num_classes=80)
det = Detector.from_checkpoint('/tmp/c80_run/cocosim80/yolov3_cocosim80_checkpoint_001999.npz',
                               cfg, precision="bf16")
img = cv2.cvtColor(cv2.imread('/tmp/cocosim80/images/im00003.jpg'), cv2.COLOR_BGR2RGB)
for conf in (0.25, 0.05, 0.005):
    res = det.detect([img], conf_thr=conf, nms_thr=0.45, dim=416)[0]
    print(f"conf {conf}: {len(res)} dets", res[:3] if len(res) else "", flush=True)
# ground truth for the image
lbl = open('/tmp/cocosim80/labels/im00003.txt').read().strip().splitlines()
print("GT:", lbl[:4], "…", len(lbl), "objects")
chiplock.release()
