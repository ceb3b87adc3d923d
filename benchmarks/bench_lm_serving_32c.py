"""Pin the concurrency crossover: 32 clients, both archs, warm."""
import json, os, sys, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.bench_lm_serving import _flagship_lm, bench_concurrent_http
from mqgan_tpu.deploy.export_lm import export_music_lm

rows = []
for arch in ("lstm", "transformer"):
    model, params, margs = _flagship_lm(arch)
    d = tempfile.mkdtemp(prefix=f"lm_serve32_{arch}_")
    export_music_lm(model, params, d, gen_buckets=(256,), prompt_buckets=(1,),
                    score_buckets=(256,), bos_id=1, lm_args=margs, verify=False)
    rows += bench_concurrent_http(d, 32, 256, 4, arch=arch + "32c")
with open("/root/repo/benchmarks/results_r5_lmserve_32c.json", "w") as f:
    json.dump(rows, f, indent=1); f.write("\n")
print("wrote results_r5_lmserve_32c.json")
