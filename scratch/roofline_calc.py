"""Analytic per-stage roofline for the int8 serving forward (bs64, 416).

Fills the VERDICT-r4 ask: decompose the measured 22.74 ms e2e step
stage-by-stage against each stage's own hardware bound, with arithmetic,
so the implied single-chip ceiling is a falsifiable statement instead of a
hand-wave.  Pure arithmetic — no device needed.

Stage buckets match scratch/profile_int8b.py's measured attribution
(entry = u8 entry through down1; stages 1-4 = the 104/52/26/13-px
residual stages; heads = the 3 head towers + det convs + up convs).

Bounds used (this chip, measured, CLAUDE.md):
* int8 conv sustained rate: ~300 TOP/s best observed (367 on stage4
  shapes, ~190-220 on wide-K tiles) — we bound with 300 for interior
  stages and with the measured 198 padded-rate for the entry,
* HBM: ~172 GB/s (measured, not the 819 v5e spec).
"""

B = 64


def conv(h_in, cin, cout, k=3, stride=1, h_out=None):
    h_out = h_out or h_in // stride
    macs = (h_out * h_out) * cin * cout * k * k
    bytes_ = h_in * h_in * cin + h_out * h_out * cout  # int8 activations
    wbytes = k * k * cin * cout
    return macs, bytes_, wbytes


def res(h, c):
    m1, b1, w1 = conv(h, c, c // 2, k=1)
    m2, b2, w2 = conv(h, c // 2, c, k=3)
    return m1 + m2, b1 + b2, w1 + w2


def bucket(layers):
    m = sum(x[0] for x in layers)
    by = sum(x[1] for x in layers)
    w = sum(x[2] for x in layers)
    return m, by, w


stages = {}
# entry: conv0 3->32 @416, down0 32->64 @208, stage0 res, down1 64->128
# (dense math; the s2d4 stem EXECUTES these as padded-K megaconvs — the
# padded TOP count is 1.5 TOP/batch measured, used separately below)
stages["entry"] = bucket([
    conv(416, 3, 32, 3, 1), conv(416, 32, 64, 3, 2), res(208, 64)[0:3],
    conv(208, 64, 128, 3, 2)])
stages["stage1"] = bucket([res(104, 128), res(104, 128),
                           conv(104, 128, 256, 3, 2)])
stages["stage2"] = bucket([res(52, 256)] * 8 + [conv(52, 256, 512, 3, 2)])
stages["stage3"] = bucket([res(26, 512)] * 8 + [conv(26, 512, 1024, 3, 2)])
stages["stage4"] = bucket([res(13, 1024)] * 4)
# heads: tower0 (13px: 1024->512->1024 x3 alternating + det), up0+tower1
# (26px), up1+tower2 (52px)
t0 = [conv(13, 1024, 512, 1), conv(13, 512, 1024, 3),
      conv(13, 1024, 512, 1), conv(13, 512, 1024, 3),
      conv(13, 1024, 512, 1), conv(13, 512, 1024, 3),
      conv(13, 1024, 255, 1)]
t1 = [conv(13, 512, 256, 1),  # up conv (then 2x upsample)
      conv(26, 256 + 512, 256, 1), conv(26, 256, 512, 3),
      conv(26, 512, 256, 1), conv(26, 256, 512, 3),
      conv(26, 512, 256, 1), conv(26, 256, 512, 3),
      conv(26, 512, 255, 1)]
t2 = [conv(26, 256, 128, 1),
      conv(52, 128 + 256, 128, 1), conv(52, 128, 256, 3),
      conv(52, 256, 128, 1), conv(52, 128, 256, 3),
      conv(52, 256, 128, 1), conv(52, 128, 256, 3),
      conv(52, 256, 255, 1)]
stages["heads"] = bucket(t0 + t1 + t2)

MEASURED_MS = {"entry": 7.5, "stage1": 1.2, "stage2": 3.7, "stage3": 3.2,
               "stage4": 1.5, "heads": 3.5}
RATE = {"entry": 198e12}           # measured padded-entry rate
PADDED_TOP_ENTRY = 1.5e12          # measured padded OPs per batch64
DEFAULT_RATE = 300e12
HBM = 172e9

print(f"{'stage':8s} {'GMAC/img':>9s} {'dense TOP':>10s} {'MB/img':>7s} "
      f"{'t_mxu':>7s} {'t_hbm':>7s} {'bound':>7s} {'meas':>6s} {'eff':>5s}")
total_bound = total_meas = 0.0
for name, (macs, abytes, wbytes) in stages.items():
    ops = 2 * macs * B
    if name == "entry":
        ops_exec = PADDED_TOP_ENTRY  # s2d megaconv pads K; those are the
        # FLOPs the MXU actually runs (measured)
    else:
        ops_exec = ops
    byts = abytes * B + wbytes
    t_mxu = ops_exec / RATE.get(name, DEFAULT_RATE) * 1e3
    t_hbm = byts / HBM * 1e3
    bound = max(t_mxu, t_hbm)
    meas = MEASURED_MS[name]
    total_bound += bound
    total_meas += meas
    print(f"{name:8s} {macs / 1e9:9.2f} {ops / 1e12:10.2f} "
          f"{(abytes + wbytes / B) / 1e6:7.1f} {t_mxu:7.2f} {t_hbm:7.2f} "
          f"{bound:7.2f} {meas:6.1f} {bound / meas:5.2f}")
print(f"\nforward bound sum: {total_bound:.2f} ms vs measured "
      f"{total_meas:.1f} ms (+ decode/NMS 2.1 meas)")
post = 2.1
print(f"e2e floor at current formulation: {total_bound + post:.2f} ms "
      f"-> {B / (total_bound + post) * 1e3:.0f} imgs/s")
print(f"measured e2e: 22.74 ms -> 2815 imgs/s")
