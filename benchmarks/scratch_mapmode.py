from benchmarks.slam_bench import run
for budget, eng in ((65536, "brute"), (65536, "hash"), (131072, "hash")):
    try:
        out = run(frames=300, enable_ba=True, map_budget=budget, map_nn=eng)
        print(budget, eng, {k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in out.items() if k in ("ate_cm", "slam_fps", "keyframes")})
    except Exception as e:
        print(budget, eng, "FAILED", str(e)[:160])
