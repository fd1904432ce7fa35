"""Round-5 debug: why is the cocosim80 checkpoint blind at serving?

Loads the final checkpoint, runs ONE training image through (a) the
serving folded-bf16 forward (running stats) and (b) the train-mode
forward (batch stats), and prints max objectness per scale for each.
"""
import sys, numpy as np, cv2, jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.train.checkpoint import load_checkpoint
from yolo_v3_tpu.ops.letterbox import letterbox_host
from yolo_v3_tpu.utils import chiplock
from yolo_v3_tpu.utils.config import YoloConfig

chiplock.acquire("probe_c80_blind")
cfg = YoloConfig(num_classes=80)
ck = load_checkpoint('/tmp/c80_run/cocosim80/yolov3_cocosim80_checkpoint_001999.npz')
params, state = ck['params'], ck['state']
img = cv2.cvtColor(cv2.imread('/tmp/cocosim80/images/im00003.jpg'), cv2.COLOR_BGR2RGB)
lb = letterbox_host(img, (416, 416)).astype(np.float32)[None] / 255.0
x = jnp.asarray(lb); xb = x.astype(jnp.bfloat16)

folded = D.cast_params(D.fold_batchnorm(params, state), jnp.bfloat16)
raws_serve = jax.jit(lambda p, v: D.apply_yolonet_folded(p, v))(folded, xb)
raws_train, _ = jax.jit(lambda p, s, v: D.apply_yolonet(
    p, s, v, training=True))(params, state, x)

for name, raws in (("serve/folded+running", raws_serve),
                   ("train/batch-stats", raws_train)):
    objs = []
    for r in raws:
        # raw head layout [B,H,W,3*(5+C)] — objectness at channel 4 of each anchor
    	na = r.shape[-1] // (5 + cfg.num_classes)
    	rr = np.asarray(r, np.float32).reshape(r.shape[0], r.shape[1], r.shape[2], na, 5 + cfg.num_classes)
    	objs.append(float(jax.nn.sigmoid(rr[..., 4]).max()))
    print(name, "max obj per scale:", [f"{o:.4f}" for o in objs], flush=True)
chiplock.release()
