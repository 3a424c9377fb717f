#!/usr/bin/env python
"""Convert a snarkjs-format verification key JSON to the ethsnarks layout.

Counterpart of /root/reference/phase2/tools/vk2ethsnarks.py: hex-encodes the
decimal coordinates, swaps the Fq2 component order for beta/gamma/delta, and
renames ic -> gammaABC.
"""

import json
import sys


def to_hex(d):
    return hex(int(d))


def main():
    if len(sys.argv) != 3:
        print("Usage:\n<input_vk.json> <ethsnarks_vk.json>")
        raise SystemExit(64)
    with open(sys.argv[1]) as f:
        vk_in = json.load(f)

    def g2_swapped(key):
        return [[to_hex(vk_in[key][i][1 - j]) for j in range(2)] for i in range(2)]

    vk = {
        "alpha": [to_hex(vk_in["vk_alfa_1"][i]) for i in range(2)],
        "beta": g2_swapped("vk_beta_2"),
        "gamma": g2_swapped("vk_gamma_2"),
        "delta": g2_swapped("vk_delta_2"),
        # the reference tool reads f["IC"]; snarkjs/our export key is "ic"
        "gammaABC": [
            [to_hex(vk_in["ic"][i][j]) for j in range(2)] for i in range(2)
        ],
    }
    with open(sys.argv[2], "w") as f:
        f.write(json.dumps(vk, sort_keys=True, indent=4))
    print("vk file created: " + sys.argv[2])


if __name__ == "__main__":
    main()
