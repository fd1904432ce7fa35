import sys, numpy as np, cv2, jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.train.checkpoint import load_checkpoint
from yolo_v3_tpu.ops.letterbox import letterbox_host
from yolo_v3_tpu.utils import chiplock
chiplock.acquire("probe_c80_stem")
ck = load_checkpoint('/tmp/c80_run/cocosim80/yolov3_cocosim80_checkpoint_001999.npz')
params, state = ck['params'], ck['state']
paths = [l.strip() for l in open('/tmp/cocosim80/list.txt')][:32]
imgs = np.stack([letterbox_host(cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB), (416,416))
                 for p in paths]).astype(np.float32)/255.0
x = jnp.asarray(imgs)
sp, ss = params['backbone']['stem'], state['backbone']['stem']
y = np.asarray(jax.jit(lambda w, v: jax.lax.conv_general_dilated(
    v, w, (1,1), ((1,1),(1,1)), dimension_numbers=('NHWC','HWIO','NHWC')))(sp['w'].astype(jnp.float32), x))
print('stem conv out: mean', y.mean(), 'var', y.var())
print('stored stem:   mean', np.asarray(ss['mean']).mean(), 'var', np.asarray(ss['var']).mean())
print('stem w absmean', float(np.abs(np.asarray(sp['w'])).mean()),
      'bn scale mean', float(np.asarray(sp['bn']['scale']).mean()),
      'bn bias mean', float(np.asarray(sp['bn']['bias']).mean()))
# now the full train-mode forward's new stem state
_, ns = jax.jit(lambda p,s,v: D.apply_yolonet(p,s,v,training=True))(params, state, x)
nm = np.asarray(ns['backbone']['stem']['mean'])
print('new stem mean head:', nm[:4], ' old:', np.asarray(ss['mean'])[:4])
chiplock.release()
