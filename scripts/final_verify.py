import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, cv2
import jax, jax.numpy as jnp
import tpuimg
from tpuimg.pipeline import enhance
from tpuimg.ops.metrics import max_abs_diff
from tpuimg.oracle import (gaussian_ref, integral_ref, hist_equalize_ref,
                           clahe_ref, erode_ref, guided_filter_ref)

log = open("final_verify.log", "a")
def p(s):
    print(s, flush=True); log.write(s+"\n"); log.flush()

p(f"devices: {jax.devices()}")
gray = cv2.imread("/root/reference/Histogram/data/night_gray.png", cv2.IMREAD_GRAYSCALE)
gray = cv2.resize(gray, (1920, 1080))
f = gray.astype(np.float32)/255

p(f"HE exact vs oracle: {np.array_equal(np.asarray(tpuimg.hist_equalize(gray)), hist_equalize_ref(gray))}")
d = np.abs(np.asarray(tpuimg.clahe(gray, 2.0, 8, 8)).astype(int) - clahe_ref(gray, 2.0, 8, 8).astype(int)).max()
p(f"CLAHE maxdiff vs oracle: {d}")
p(f"integral exact: {np.array_equal(np.asarray(tpuimg.integral(gray)), integral_ref(gray))}")
p(f"erode r15 exact: {np.array_equal(np.asarray(tpuimg.erode(gray, 15)), erode_ref(gray, 15))}")
g = np.abs(np.asarray(tpuimg.gaussian(f, 2, 1.5)) - gaussian_ref(f, 2, 1.5)).max()
p(f"gaussian maxdiff: {g:.2e}")
q = np.abs(np.asarray(tpuimg.guided_filter(f, f, 4, 1e-3, border='reflect101')) -
           guided_filter_ref(f, f, 4, 1e-3, border='reflect101')).max()
p(f"guided r4 (pallas auto) maxdiff: {q:.2e}")
out = np.asarray(enhance(gray))
p(f"enhance pipeline: shape {out.shape} dtype {out.dtype} range [{out.min()},{out.max()}]")
# batched HE per-frame on device
batch = np.stack([gray//4, np.clip(gray.astype(int)+100,0,255).astype(np.uint8)])
ob = np.asarray(tpuimg.hist_equalize(batch))
ok = (np.array_equal(ob[0], hist_equalize_ref(batch[0])) and
      np.array_equal(ob[1], hist_equalize_ref(batch[1])))
p(f"batched HE per-frame exact: {ok}")
# on-device metric on integral-scale values
ii = tpuimg.integral(gray)
p(f"on-device maxdiff(ii, ii): {int(max_abs_diff(ii, ii))}")
# worst-case carry magnitude: all-255 8K-wide frame. The cross-tile row
# carry reaches W*255 ≈ 2^21 here — the regime where a DEFAULT-precision
# carry matmul silently truncates (round-2 review finding); must be exact.
wide = np.full((256, 7680), 255, np.uint8)
p(f"integral 8K-wide all-255 exact: "
  f"{np.array_equal(np.asarray(tpuimg.integral(wide)), integral_ref(wide))}")
p("DONE")
