// Golden-oracle tool: dump the first N negative-miner windows produced by
// the reference CvCascadeImageReader::NegReader schedule (imagestorage.cpp).
// usage: dump_negreader <bg.txt> <winW> <winH> <N>
#include <cstdio>
#include <cstdlib>
#include <opencv2/core.hpp>
// test-only: expose the private nested NegReader for golden dumping
#define private public
#include "imagestorage.h"
#undef private

int main(int argc, char** argv) {
    if (argc < 5) return 1;
    cv::Size win(atoi(argv[2]), atoi(argv[3]));
    int n = atoi(argv[4]);
    CvCascadeImageReader::NegReader neg;
    if (!neg.create(argv[1], win)) { fprintf(stderr, "create failed\n"); return 1; }
    cv::Mat img(win, CV_8UC1);
    for (int i = 0; i < n; i++) {
        if (!neg.get(img)) { printf("END %d\n", i); return 0; }
        for (int y = 0; y < win.height; y++)
            for (int x = 0; x < win.width; x++)
                printf("%d\n", (int)img.at<uchar>(y, x));
    }
    return 0;
}
