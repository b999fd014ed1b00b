"""Merge standalone oracle-ceiling results into ACCURACY.json.

tools_dev/run_oracle.py computes exactly what `accuracy.py --oracle`
would attach per axis (same corpus seeds/params, same decoder), but runs
on CPU in parallel with TPU work. This script copies its per-axis
summaries under the matching axis's "oracle" key.

Usage: python tools_dev/merge_oracle.py [--oracle /tmp/oracle_axes.json]
"""
import argparse
import json

REPO = "/root/repo"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--oracle", default="/tmp/oracle_axes.json")
    p.add_argument("--accuracy", default=f"{REPO}/ACCURACY.json")
    args = p.parse_args()
    with open(args.oracle) as f:
        oracle = json.load(f)
    with open(args.accuracy) as f:
        acc = json.load(f)
    for axis, summary in oracle.items():
        if axis in acc:
            acc[axis]["oracle"] = summary
            print(f"{axis}: oracle skill {summary['skill']:.4f} "
                  f"(model {acc[axis]['skill']:.4f} = "
                  f"{acc[axis]['skill'] / summary['skill']:.0%} of oracle)")
    with open(args.accuracy, "w") as f:
        json.dump(acc, f, indent=2, sort_keys=True)
        f.write("\n")


if __name__ == "__main__":
    main()
