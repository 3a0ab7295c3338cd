"""Per-refresh device-time breakdown of fork-default (GRU-on) b=1 serving
(VERDICT r4 item 9): where do the ~12 sequential GRU refreshes spend their
time — encode_dep, the 3-gate ConvGRU, decode_aff (incl. the fused Pallas
dec_aff_tail), vs the one-time encoder/decoder/heads?

    PYTHONPATH=/root/repo:/root/.axon_site python devtools/profile_refresh.py [h w]
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
h = int(sys.argv[1]) if len(sys.argv) > 2 else 240
w = int(sys.argv[2]) if len(sys.argv) > 2 else 1216

rng = np.random.default_rng(0)
sample = {
    "rgb": jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32),
    "dep": jnp.asarray((rng.random((1, h, w, 1)) > 0.97) * 5, jnp.float32),
}
cfg = Config(patch_height=h, patch_width=w, batch_size=1,
             max_depth=90.0, num_sample=0).finalize()  # fork default, GRU on
model = get_model(cfg)
var = jax.jit(lambda k, s: model.init(k, s, train=False))(
    jax.random.PRNGKey(0), sample)
fwd = jax.jit(lambda v, s: model.apply(v, s, train=False,
                                       need_inter=False)["pred"])
for _ in range(3):
    out = fwd(var, sample)
jax.block_until_ready(out)

hlo = fwd.lower(var, sample).compile().as_text()
name_to_site = {}
pat = re.compile(r"^\s*%?([\w.-]+) = .*?metadata=\{op_name=\"([^\"]*)\"", re.M)
for m in pat.finditer(hlo):
    name_to_site[m.group(1)] = m.group(2)

calls = 8
with tempfile.TemporaryDirectory(prefix="profref_") as td:
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

GROUPS = [
    ("refresh/encode_dep", "encode_dep"),
    ("refresh/GRU", "/GRU/"),
    ("refresh/decode_aff", "decode_aff"),
    ("refresh/dec_aff_tail(pallas)", "dec_aff_tail"),
    ("one-time/S2D", "/S2D/"),
    ("one-time/heads", "/heads/"),
    ("one-time/encoder", "/layer"),
    ("one-time/decoder", "/dec"),
    ("one-time/stem", "conv1_"),
    ("one-time/conv5", "conv5"),
    ("loop/propagate+blend", "prop"),
]


def group_of(site: str) -> str:
    for g, needle in GROUPS:
        if needle in site:
            return g
    return "other"


by_group = defaultdict(float)
by_site = defaultdict(float)
total = 0.0
for e in events:
    nm = e["name"]
    site = name_to_site.get(nm, name_to_site.get(nm.replace("%", ""), "?"))
    d = float(e["dur"]) / calls
    total += d
    by_group[group_of(site)] += d
    by_site["/".join(site.split("/")[:5]) if site != "?" else
            f"?:{nm[:30]}"] += d

n_refresh = cfg.prop_time - 1
print(f"== fork-default b=1 {h}x{w}: device total {total/1e3:.2f} ms, "
      f"{n_refresh} GRU refreshes ==")
for g, v in sorted(by_group.items(), key=lambda kv: -kv[1]):
    per = f"  ({v/n_refresh:7.1f} us/refresh)" if g.startswith("refresh") \
        else ""
    print(f"  {v/1e3:7.2f} ms  {g}{per}")
print("== top 20 sites (us/call) ==")
for k, v in sorted(by_site.items(), key=lambda kv: -kv[1])[:20]:
    print(f"  {v:9.1f}  {k}")
