// Native sample-IO runtime for cascadeclassifier_tpu.
//
// C++ implementation of the host-side data path (the part of the pipeline
// that stays on CPU in production): .vec positive-sample decode/encode and
// the deterministic multi-scale background-window miner with the exact
// schedule of the reference NegReader (reference imagestorage.cpp:23-126).
// Exposed as a C ABI consumed from Python via ctypes
// (cascadeclassifier_tpu/data/native.py); the Python implementations remain
// as the portable fallback and the two are byte-equivalence-tested.
//
// Image decode + INTER_LINEAR_EXACT resize use OpenCV (the same dependency
// the reference's IO layer uses); everything else is self-contained.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

extern "C" {

// ---------------------------------------------------------------- vec IO

struct VecHandle {
    std::vector<uint8_t> samples;  // count * vecsize decoded u8
    int count = 0;
    int vecsize = 0;
};

void* cctpu_vec_open(const char* path, int* count, int* vecsize) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    int32_t cnt = 0, vs = 0;
    int16_t t1, t2;
    if (fread(&cnt, 4, 1, f) != 1 || fread(&vs, 4, 1, f) != 1 ||
        fread(&t1, 2, 1, f) != 1 || fread(&t2, 2, 1, f) != 1) {
        fclose(f);
        return nullptr;
    }
    auto* h = new VecHandle();
    h->count = cnt;
    h->vecsize = vs;
    h->samples.resize((size_t)cnt * vs);
    std::vector<int16_t> rec(vs);
    for (int i = 0; i < cnt; i++) {
        uint8_t pad;
        if (fread(&pad, 1, 1, f) != 1 ||
            fread(rec.data(), 2, vs, f) != (size_t)vs) {
            fclose(f);
            delete h;
            return nullptr;
        }
        uint8_t* dst = h->samples.data() + (size_t)i * vs;
        for (int j = 0; j < vs; j++) dst[j] = (uint8_t)rec[j];
    }
    fclose(f);
    *count = cnt;
    *vecsize = vs;
    return h;
}

int cctpu_vec_read(void* handle, int start, int n, uint8_t* out) {
    auto* h = (VecHandle*)handle;
    if (!h || start < 0 || start >= h->count) return 0;
    int m = std::min(n, h->count - start);
    memcpy(out, h->samples.data() + (size_t)start * h->vecsize,
           (size_t)m * h->vecsize);
    return m;
}

void cctpu_vec_close(void* handle) { delete (VecHandle*)handle; }

int cctpu_vec_write(const char* path, const uint8_t* data, int count,
                    int vecsize) {
    FILE* f = fopen(path, "wb");
    if (!f) return 0;
    int32_t cnt = count, vs = vecsize;
    int16_t zero = 0;
    fwrite(&cnt, 4, 1, f);
    fwrite(&vs, 4, 1, f);
    fwrite(&zero, 2, 1, f);
    fwrite(&zero, 2, 1, f);
    std::vector<int16_t> rec(vecsize);
    for (int i = 0; i < count; i++) {
        uint8_t pad = 0;
        fwrite(&pad, 1, 1, f);
        const uint8_t* src = data + (size_t)i * vecsize;
        for (int j = 0; j < vecsize; j++) rec[j] = src[j];
        fwrite(rec.data(), 2, vecsize, f);
    }
    fclose(f);
    return count;
}

// ------------------------------------------------- negative window miner

struct NegHandle {
    std::vector<std::string> files;
    int win_w = 0, win_h = 0;
    cv::Mat src, img;
    cv::Point point{0, 0}, offset{0, 0};
    float scale = 1.0f;
    const float scale_factor = 1.4142135623730950488016887242097f;
    const float step_factor = 0.5f;
    size_t last = 0;
    int round = 0;

    bool next_img() {
        size_t count = files.size();
        cv::Point off(0, 0);
        cv::Mat s;
        for (size_t i = 0; i < count; i++) {
            s = cv::imread(files[last++], cv::IMREAD_GRAYSCALE);
            if (s.empty()) {
                last %= count;
                continue;
            }
            round += (int)(last / count);
            round %= win_w * win_h;
            last %= count;
            off.x = std::min(round % win_w, s.cols - win_w);
            off.y = std::min(round / win_w, s.rows - win_h);
            if (s.type() == CV_8UC1 && off.x >= 0 && off.y >= 0) break;
            s.release();
        }
        if (s.empty()) return false;
        src = s;
        point = offset = off;
        scale = std::max(((float)win_w + off.x) / src.cols,
                         ((float)win_h + off.y) / src.rows);
        cv::Size sz((int)(scale * src.cols + 0.5f),
                    (int)(scale * src.rows + 0.5f));
        cv::resize(src, img, sz, 0, 0, cv::INTER_LINEAR_EXACT);
        return true;
    }

    bool get(uint8_t* out) {
        if (img.empty() && !next_img()) return false;
        for (int r = 0; r < win_h; r++)
            memcpy(out + (size_t)r * win_w, img.ptr(point.y + r) + point.x,
                   win_w);
        if ((int)(point.x + (1.0f + step_factor) * win_w) < img.cols) {
            point.x += (int)(step_factor * win_w);
        } else {
            point.x = offset.x;
            if ((int)(point.y + (1.0f + step_factor) * win_h) < img.rows) {
                point.y += (int)(step_factor * win_h);
            } else {
                point.y = offset.y;
                scale *= scale_factor;
                if (scale <= 1.0f) {
                    cv::resize(src, img,
                               cv::Size((int)(scale * src.cols),
                                        (int)(scale * src.rows)),
                               0, 0, cv::INTER_LINEAR_EXACT);
                } else {
                    if (!next_img()) return false;
                }
            }
        }
        return true;
    }
};

void* cctpu_neg_open(const char* bg_path, int win_w, int win_h) {
    std::ifstream f(bg_path);
    if (!f.is_open()) return nullptr;
    auto* h = new NegHandle();
    h->win_w = win_w;
    h->win_h = win_h;
    std::string line;
    while (std::getline(f, line)) {
        size_t end = line.find_last_not_of(" \n\r\t");
        if (end == std::string::npos) break;  // empty line terminates
        line.erase(end + 1);
        if (line.empty()) break;
        if (line[0] == '#') continue;
        h->files.push_back(line);
    }
    if (h->files.empty()) {
        delete h;
        return nullptr;
    }
    return h;
}

// fills up to n windows (n * win_h * win_w bytes); returns how many
int cctpu_neg_next(void* handle, uint8_t* out, int n) {
    auto* h = (NegHandle*)handle;
    if (!h) return 0;
    int filled = 0;
    size_t stride = (size_t)h->win_w * h->win_h;
    for (int i = 0; i < n; i++) {
        if (!h->get(out + (size_t)filled * stride)) break;
        filled++;
    }
    return filled;
}

void cctpu_neg_close(void* handle) { delete (NegHandle*)handle; }

}  // extern "C"

// ------------------------------------------------ rectangle grouping
// Exact cv::groupRectangles semantics (see detect/grouping.py for the
// specification); O(N^2) union-find runs here at native speed.

extern "C" int cctpu_group_rectangles(const int32_t* rects_in, int n,
                                      int group_threshold, double eps,
                                      int32_t* rects_out /* cap n*4 */) {
    if (group_threshold <= 0 || n == 0) {
        memcpy(rects_out, rects_in, (size_t)n * 4 * sizeof(int32_t));
        return n;
    }
    std::vector<int> parent(n);
    for (int i = 0; i < n; i++) parent[i] = i;
    auto find = [&](int a) {
        while (parent[a] != a) {
            parent[a] = parent[parent[a]];
            a = parent[a];
        }
        return a;
    };
    auto similar = [&](int i, int j) {
        const int32_t* r1 = rects_in + (size_t)i * 4;
        const int32_t* r2 = rects_in + (size_t)j * 4;
        double delta =
            eps * (std::min(r1[2], r2[2]) + std::min(r1[3], r2[3])) * 0.5;
        return std::abs(r1[0] - r2[0]) <= delta &&
               std::abs(r1[1] - r2[1]) <= delta &&
               std::abs(r1[0] + r1[2] - r2[0] - r2[2]) <= delta &&
               std::abs(r1[1] + r1[3] - r2[1] - r2[3]) <= delta;
    };
    for (int i = 0; i < n; i++)
        for (int j = i + 1; j < n; j++)
            if (similar(i, j)) {
                int ri = find(i), rj = find(j);
                if (ri != rj) parent[rj] = ri;
            }

    std::vector<int> root(n), cls(n, -1);
    int nclasses = 0;
    for (int i = 0; i < n; i++) root[i] = find(i);
    std::vector<int> order;  // class id by first appearance
    for (int i = 0; i < n; i++)
        if (cls[root[i]] < 0) cls[root[i]] = nclasses++;
    std::vector<int64_t> acc(4 * (size_t)nclasses, 0);
    std::vector<int> cnt(nclasses, 0);
    for (int i = 0; i < n; i++) {
        int c = cls[root[i]];
        for (int k = 0; k < 4; k++) acc[4 * (size_t)c + k] += rects_in[4 * (size_t)i + k];
        cnt[c]++;
    }
    auto cvround = [](double v) { return (int)lrint(v); };
    // OpenCV averages with float s = 1.f/n and FLOAT products
    // (cascadedetect.cpp groupRectangles) — replicate the
    // single-precision arithmetic for byte parity
    std::vector<int> rr(4 * (size_t)nclasses);
    for (int c = 0; c < nclasses; c++) {
        float s = 1.0f / (float)cnt[c];
        for (int k = 0; k < 4; k++)
            rr[4 * (size_t)c + k] =
                (int)lrintf((float)acc[4 * (size_t)c + k] * s);
    }
    int out = 0;
    for (int i = 0; i < nclasses; i++) {
        int n1 = cnt[i];
        if (n1 <= group_threshold) continue;
        bool contained = false;
        for (int j = 0; j < nclasses; j++) {
            int n2 = cnt[j];
            if (j == i || n2 <= group_threshold) continue;
            const int* r1 = &rr[4 * (size_t)i];
            const int* r2 = &rr[4 * (size_t)j];
            int dx = cvround(r2[2] * eps);
            int dy = cvround(r2[3] * eps);
            if (r1[0] >= r2[0] - dx && r1[1] >= r2[1] - dy &&
                r1[0] + r1[2] <= r2[0] + r2[2] + dx &&
                r1[1] + r1[3] <= r2[1] + r2[3] + dy &&
                (n2 > std::max(3, n1) || n1 < 3)) {
                contained = true;
                break;
            }
        }
        if (!contained) {
            memcpy(rects_out + (size_t)out * 4, &rr[4 * (size_t)i],
                   4 * sizeof(int32_t));
            out++;
        }
    }
    return out;
}
