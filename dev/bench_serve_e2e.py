"""End-to-end CLI serving throughput: decode -> H2D -> jitted forward+NMS ->
draw -> PNG write, as a user runs it (VERDICT r3 item #3 / PERF lever #3).

Measures run_detection_inference wall-clock over a directory of real-sized
JPEGs, A/B over VCT_INFER_PREFETCH (the background decode+H2D thread in
infer/runner._prefetch_batches). This is the *user-visible* img/s; bench.py
isolates device-only throughput — the gap between the two is host
decode/draw cost on this 1-CPU container.

Protocol: the jitted forward is built ONCE and shared across arms (remote
compile takes minutes and would swamp the loop); a discarded warm pass
compiles, then each arm runs the full CLI path. Arm order is
prefetch-off, prefetch-on, prefetch-off again (drift check).

Usage: python dev/bench_serve_e2e.py <img_dir> <weights> <config.yaml> [batch]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    img_dir, weights, config_path = sys.argv[1:4]
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    import vision_conglomerate_tpu.infer.runner as runner
    from vision_conglomerate_tpu.utils import load_yaml

    config = load_yaml(config_path)
    n_imgs = len([f for f in os.listdir(img_dir)
                  if f.lower().endswith((".jpg", ".jpeg", ".png"))])

    # share one compiled forward across all runs: compile-free A/B
    cache = {}
    orig_make_forward = runner._make_forward

    def caching_make_forward(model, variables, folded, int8=False):
        if "fwd" not in cache:
            cache["fwd"] = orig_make_forward(model, variables, folded, int8)
        return cache["fwd"]

    runner._make_forward = caching_make_forward

    def arm(prefetch, tag, out_ext="png"):
        os.environ["VCT_INFER_PREFETCH"] = "1" if prefetch else "0"
        t0 = time.perf_counter()
        runner.run_detection_inference(
            path=img_dir, weights_path=weights, config=config,
            task="detection", batch_size=batch, iou_threshold=0.35,
            score_threshold=0.3, with_summary=False,
            storage_path=f"/tmp/serve_e2e_{tag}", out_ext=out_ext)
        return time.perf_counter() - t0

    dt_warm = arm(False, "warm")  # compile pass, discarded
    print(f"warm (compile) pass: {dt_warm:.1f}s", flush=True)
    dt_off1 = arm(False, "off1")
    print(f"prefetch=0: {n_imgs} imgs in {dt_off1:.1f}s = "
          f"{n_imgs / dt_off1:.1f} img/s", flush=True)
    dt_on = arm(True, "on")
    print(f"prefetch=1: {n_imgs} imgs in {dt_on:.1f}s = "
          f"{n_imgs / dt_on:.1f} img/s", flush=True)
    dt_off2 = arm(False, "off2")
    print(f"prefetch=0 (repeat): {n_imgs} imgs in {dt_off2:.1f}s = "
          f"{n_imgs / dt_off2:.1f} img/s", flush=True)
    print(f"speedup prefetch on/off: {dt_off1 / dt_on:.2f}x "
          f"(drift check off1/off2 = {dt_off1 / dt_off2:.2f})", flush=True)
    # PNG encode of the annotated og-size outputs dominates the host cost
    # on 1-CPU containers; --out_ext jpg is the measured lever
    dt_jpg = arm(False, "jpg", out_ext="jpg")
    print(f"out_ext=jpg (prefetch=0): {n_imgs} imgs in {dt_jpg:.1f}s = "
          f"{n_imgs / dt_jpg:.1f} img/s ({dt_off2 / dt_jpg:.2f}x vs png)")


if __name__ == "__main__":
    main()
