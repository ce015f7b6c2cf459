"""A/B micro-bench for the robots matcher on a rule-heavy host
(VERDICT r3 item 5): times the admission-side vectorized gate over N
candidate URLs against one host carrying R allow/disallow rules —
naive per-rule scan vs per-host compiled matcher (trie + cached).

Pure-Python timing (the UDF body is identical either way — the
compiled matcher replaces the inner loop, not the Spark plumbing), so
the numbers isolate the matcher itself; plus one through-Spark wall of
the admission gate for context.

Usage: python tools/robots_bench.py [n_urls] [n_rules]
"""

import sys
import time

sys.path.insert(0, ".")


def naive(allow, disallow, path):
    from infinitycrawler_spark.functions.robots import rule_match_len

    best, ok = -1, True
    for rule in allow:
        m = rule_match_len(rule, path)
        if m > best:
            best, ok = m, True
    for rule in disallow:
        m = rule_match_len(rule, path)
        if m > best:
            best, ok = m, False
    return ok


def main():
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_rules = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000

    import random

    from infinitycrawler_spark.functions.robots import CompiledRuleset

    rng = random.Random(7)
    segs = ["assets", "img", "private", "api", "v2", "cache", "p",
            "x", "data", "tmp"]

    def rand_rule(wild_p=0.05):
        r = "/" + "/".join(rng.choice(segs)
                           for _ in range(rng.randrange(1, 4)))
        if rng.random() < wild_p:
            r += "*"
        return r

    allow = [rand_rule() for _ in range(n_rules // 4)]
    disallow = [rand_rule() for _ in range(n_rules - len(allow))]
    paths = ["/" + "/".join(rng.choice(segs)
                            for _ in range(rng.randrange(1, 5)))
             for _ in range(n_urls)]

    t0 = time.time()
    naive_out = [naive(allow, disallow, p) for p in paths]
    t_naive = time.time() - t0

    t0 = time.time()
    m = CompiledRuleset(allow, disallow)
    t_compile = time.time() - t0
    t0 = time.time()
    comp_out = [m.is_allowed(p) for p in paths]
    t_comp = time.time() - t0

    assert naive_out == comp_out, "matcher divergence!"
    print(f"rules={n_rules} urls={n_urls}")
    print(f"naive per-rule scan : {t_naive:8.3f} s"
          f"  ({n_urls / t_naive:,.0f} urls/s)")
    print(f"compiled (trie)     : {t_comp:8.3f} s"
          f"  ({n_urls / t_comp:,.0f} urls/s)"
          f"  + one-time compile {t_compile * 1000:.1f} ms")
    print(f"speedup             : {t_naive / t_comp:8.1f}x")


if __name__ == "__main__":
    main()
