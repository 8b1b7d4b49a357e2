"""End-to-end soft-argmax training (train_ransac_softam.cpp).

Same machinery as train_ransac with the SoftAM objective: the softmax
distribution AVERAGES the hypothesis pool (rodrigues+t linear combination,
cnn_softam.h:1082-1094), only the average is refined, and the loss is the
plain maxLoss of the refined average (cnn_softam.h:1163).
"""

from dsac_tpu.cli.train_ransac import main as _main


def main(argv=None):
    return _main(argv, softam=True)


if __name__ == "__main__":
    main()
