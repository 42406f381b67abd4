_base_ = ["./dw-sep-rep_r1_convnext-t.py"]

# rank-2 variant: 2 parallel cascades per dwconv (49 -> 28 taps)
app = dict(ranks=2)
