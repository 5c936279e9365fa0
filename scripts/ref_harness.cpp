// Validation harness: runs the unmodified reference fast-slic core on a raw
// RGB image and emits the uint16 label map. Used only to generate golden
// test fixtures; never shipped.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include "context.h"
#include "lsc.h"

int main(int argc, char** argv) {
    if (argc < 12) {
        fprintf(stderr,
                "usage: harness in.rgb H W K variant(std|real|l2|noq|lsc) "
                "compactness min_size_factor stride max_iter lab(0|1) out.u16 "
                "[manhattan(0|1)] [preemptive(0|1)] [pthres]\n");
        return 2;
    }
    const char* in_path = argv[1];
    int H = atoi(argv[2]), W = atoi(argv[3]), K = atoi(argv[4]);
    std::string variant = argv[5];
    float compactness = atof(argv[6]);
    float msf = atof(argv[7]);
    int stride = atoi(argv[8]);
    int max_iter = atoi(argv[9]);
    int lab = atoi(argv[10]);
    const char* out_path = argv[11];
    int manhattan = argc > 12 ? atoi(argv[12]) : 1;
    int preemptive = argc > 13 ? atoi(argv[13]) : 0;
    float pthres = argc > 14 ? atof(argv[14]) : 0.05f;

    std::vector<uint8_t> image(H * W * 3);
    FILE* f = fopen(in_path, "rb");
    if (!f || fread(image.data(), 1, image.size(), f) != image.size()) {
        fprintf(stderr, "read failed\n");
        return 1;
    }
    fclose(f);

    std::vector<Cluster> clusters(K);
    memset(clusters.data(), 0, sizeof(Cluster) * K);
    std::vector<uint16_t> out(H * W);

    fslic::BaseContext<uint16_t>* ctx16 = nullptr;
    fslic::BaseContext<float>* ctxf = nullptr;
    if (variant == "std") {
        ctx16 = new fslic::Context(H, W, K, image.data(), clusters.data());
    } else if (variant == "real") {
        ctxf = new fslic::ContextRealDist(H, W, K, image.data(), clusters.data());
    } else if (variant == "l2") {
        ctxf = new fslic::ContextRealDistL2(H, W, K, image.data(), clusters.data());
    } else if (variant == "noq") {
        ctxf = new fslic::ContextRealDistNoQ(H, W, K, image.data(), clusters.data());
    } else if (variant == "lsc") {
        ctxf = new fslic::ContextLSC(H, W, K, image.data(), clusters.data());
    } else {
        fprintf(stderr, "bad variant\n");
        return 2;
    }

#define SETUP(c) \
    (c)->compactness = compactness; \
    (c)->min_size_factor = msf; \
    (c)->subsample_stride_config = stride; \
    (c)->convert_to_lab = lab; \
    (c)->manhattan_spatial_dist = manhattan; \
    (c)->preemptive = preemptive; \
    (c)->preemptive_thres = pthres; \
    (c)->initialize_clusters(); \
    (c)->initialize_state(); \
    (c)->iterate(out.data(), max_iter);

    if (ctx16) { SETUP(ctx16); } else { SETUP(ctxf); }

    FILE* g = fopen(out_path, "wb");
    fwrite(out.data(), 2, out.size(), g);
    fclose(g);
    // also dump final cluster centers for centroid comparison
    std::string cpath = std::string(out_path) + ".clusters";
    FILE* c = fopen(cpath.c_str(), "wb");
    for (int k = 0; k < K; k++) {
        float row[6] = {clusters[k].y, clusters[k].x, clusters[k].r,
                        clusters[k].g, clusters[k].b,
                        (float)clusters[k].num_members};
        fwrite(row, sizeof(float), 6, c);
    }
    fclose(c);
    delete ctx16;
    delete ctxf;
    return 0;
}
