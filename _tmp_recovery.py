import os, json, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")
from kylespathtracer_tpu.diff import inverse
t0 = time.time()
res = inverse.run_recovery(num_spheres=10, steps=400, width=96, height=64, lr=1e-2, seed=0, log_every=50)
res["steps"] = 400; res["resolution"] = "96x64"; res["wall_s"] = round(time.time()-t0, 1)
print(json.dumps(res, indent=1))
open("RECOVERY.json","w").write(json.dumps(res, indent=1))
