"""Per-op, per-site device-time breakdown of b=1 use_GRU=False inference
(xla or pallas prop routing). Backs the r03 layout-propagation finding in
docs/PERFORMANCE.md (the heads convs degrade to T(1,128) layouts when the
whole-loop Pallas custom call is in the program).
    PYTHONPATH=/root/repo:/root/.axon_site python devtools/profile_infer.py pallas
"""
import glob
import gzip
import json
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.models import get_model
from nlspn_eccv20_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
impl = sys.argv[1] if len(sys.argv) > 1 else "pallas"
if len(sys.argv) == 3:
    sys.exit("usage: profile_infer.py [impl] [height width] — give BOTH dims")
h = int(sys.argv[2]) if len(sys.argv) > 3 else 228
w = int(sys.argv[3]) if len(sys.argv) > 3 else 304

rng = np.random.default_rng(0)
sample = {
    "rgb": jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32),
    "dep": jnp.asarray((rng.random((1, h, w, 1)) > 0.97) * 5, jnp.float32),
}
cfg = Config(patch_height=h, patch_width=w, batch_size=1,
             use_GRU=False, prop_impl=impl).finalize()
model = get_model(cfg)
var = jax.jit(lambda k, s: model.init(k, s, train=False))(
    jax.random.PRNGKey(0), sample)
fwd = jax.jit(lambda v, s: model.apply(v, s, train=False,
                                       need_inter=False)["pred"])
for _ in range(3):
    out = fwd(var, sample)
jax.block_until_ready(out)

# map HLO op -> jax op_name site
hlo = fwd.lower(var, sample).compile().as_text()
name_to_site = {}
pat = re.compile(r"^\s*%?([\w.-]+) = .*?metadata=\{op_name=\"([^\"]*)\"", re.M)
for m in pat.finditer(hlo):
    name_to_site[m.group(1)] = m.group(2)

calls = 8
with tempfile.TemporaryDirectory(prefix="profinf2_") as td:
    jax.profiler.start_trace(td)
    for _ in range(calls):
        out = fwd(var, sample)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    events = []
    for p in glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                       recursive=True):
        with gzip.open(p) as f:
            data = json.load(f)
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X" and "dur" in e and \
               re.match(r"^(fusion|convolution|copy|custom|dynamic|transpose|"
                        r"reduce|broadcast|select|scatter|gather|pad|slice|"
                        r"concatenate|bitcast)", e.get("name", "")):
                events.append(e)

by_site = defaultdict(float)
by_op = defaultdict(float)
for e in events:
    nm = e["name"]
    by_op[nm] += float(e["dur"]) / calls
    site = name_to_site.get(nm, name_to_site.get(nm.replace("%", ""), "?"))
    site_short = "/".join(site.split("/")[:4]) if site != "?" else f"?:{nm[:30]}"
    by_site[site_short] += float(e["dur"]) / calls

print(f"== {impl}: top sites (us/call) ==", flush=True)
for k, v in sorted(by_site.items(), key=lambda kv: -kv[1])[:25]:
    print(f"  {v:9.1f}  {k}")
print("== top individual ops ==")
for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
    print(f"  {v:9.1f}  {k}  [{name_to_site.get(k, '?')[:90]}]")
