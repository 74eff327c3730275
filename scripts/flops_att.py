"""FLOP accounting for the attention family (VERDICT r3 #4): GFLOP/step of
the attention TRAIN step and the attention MEGA DECODE, and the implied
TFLOP/s / MFU at a measured time.

Counts matmul FLOPs only (2*M*K*N per dot; elementwise/VPU work excluded),
matching the convention used for the B=512 factored accounting in
docs/KERNELS.md §4b.  Run with measured milliseconds to print MFU:

    python scripts/flops_att.py --train_ms 12.71 --decode_ms 19.8

MFU follows the house convention of docs/KERNELS.md §4b: achieved TFLOP/s
over the 165 TFLOP/s nominal calibrated matmul yardstick (bench.py
``calib_matmul_tflops`` — 84% of the v5e 197 TFLOP/s bf16 peak, which is
what one chip actually sustains on a large dense f32-accumulate matmul).
The raw bf16-peak fraction is printed alongside.
"""

import argparse

# the bench regime (bench.py): reference flagship sizes
B, T = 128, 25            # att train batch / consumed steps
P, ENC = 196, 2048        # spatial grid, encoder dim
E, F, H, A, V = 300, 512, 512, 512, 8192
DEC_B, K, DEC_STEPS = 96, 5, 41   # decode batch, beam, kernel grid steps
# (pallas_att_decode grid is (n_blocks, max_seq_length + 1) at max_seq=40)

PEAK_BF16 = 197e12
NOMINAL = 165e12  # calibrated yardstick (KERNELS.md §4b MFU convention)


def gmac(m, k, n):
    return float(m) * k * n  # raw MACs (name kept for call-site brevity)


def train_flops():
    rows = B
    x_in = E + ENC                     # [word_emb ; gated context]
    per_step = (
        gmac(rows, H, A)               # att2 = h @ dec_w
        + gmac(rows * P, A, 1)         # e = relu(att1+att2) @ full_w
        + gmac(rows, P, ENC)           # context = alpha @ features
        + gmac(rows, H, ENC)           # f_beta gate
        + gmac(rows, x_in, 4 * F)      # V (concat input, 4 gates)
        + 4 * gmac(rows, F, F)         # S
        + 4 * gmac(rows, F, H)         # U
        + gmac(rows, H, 4 * H)         # W
    )
    att1 = gmac(B * P, ENC, A)         # hoisted once per sequence
    init_hc = 2 * gmac(B, ENC, H)      # init_h / init_c from mean feature
    # chunked CE: fwd logits + bwd remat + dlogits matmuls ~ 3x the head
    loss = 3 * gmac(B * T, H, V)
    # backward scan ~= 2x forward (dgrad + wgrad, both full-depth matmuls)
    fwd = per_step * T + att1 + init_hc
    bwd = 2 * (per_step * T) + 2 * att1 + 2 * init_hc
    total_gmac = fwd + bwd + loss
    return 2 * total_gmac  # FLOPs


def decode_flops():
    rows = DEC_B * K
    x_in = E + ENC
    per_step = (
        gmac(rows, H, A)
        + gmac(rows * P, A, 1)
        + gmac(rows, P, ENC)
        + gmac(rows, H, ENC)
        + gmac(rows, x_in, 4 * F)
        + 4 * gmac(rows, F, F)
        + 4 * gmac(rows, F, H)
        + gmac(rows, H, 4 * H)
        + gmac(rows, H, V)             # vocab head
        + gmac(rows, V, E)             # one-hot next-token embedding
    )
    att1 = gmac(DEC_B * P, ENC, A)
    init_hc = 2 * gmac(DEC_B * K, ENC, H)
    return 2 * (per_step * DEC_STEPS + att1 + init_hc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_ms", type=float, default=None)
    ap.add_argument("--decode_ms", type=float, default=None,
                    help="ms per DEC_B-image mega decode batch")
    args = ap.parse_args()

    tf = train_flops()
    df = decode_flops()
    print(f"att TRAIN step  (B={B}, T={T}): {tf / 1e9:.1f} GFLOP")
    print(f"att MEGA decode (B={DEC_B}, k={K}, steps={DEC_STEPS}): "
          f"{df / 1e9:.1f} GFLOP")
    for name, fl, ms in (("train", tf, args.train_ms),
                         ("decode", df, args.decode_ms)):
        if ms is None:
            continue
        tput = fl / (ms / 1e3)
        print(f"{name}: {ms:.2f} ms -> {tput / 1e12:.1f} TFLOP/s "
              f"= {100 * tput / NOMINAL:.0f}% MFU vs the 165 TFLOP/s "
              f"yardstick ({100 * tput / PEAK_BF16:.0f}% of bf16 peak)")


if __name__ == "__main__":
    main()
