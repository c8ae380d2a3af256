/* parity_shim: drive the reference darknet (built as a library) and dump
 * numeric artifacts for cross-binary parity testing.
 *
 * This is our own test harness code written against the reference's public
 * API (include/darknet.h); it reproduces the exact call sequence of
 * `darknet detector test` (reference examples/detector.c:878-950):
 *
 *   load_network -> letterbox_image -> quantization_weights_and_activations
 *   -> network_predict -> get_network_boxes [-> do_nms_obj/do_nms_sort]
 *
 * and dumps, into OUTDIR:
 *   meta.txt          per-layer: idx type out_w out_h out_c outputs
 *                     quant_flag quant_stop act_scale act_zp in_scale in_zp
 *   sized.bin         letterboxed float32 input, CHW (darknet layout)
 *   input_u8.bin      quantized uint8 input (after dynamic input quant)
 *   layerNN_u8.bin    output_uint8_final of each quantized layer (CHW)
 *   layerNN_f32.bin   float output of yolo / quant_stop layers (CHW)
 *   detections.txt    one line per detection: x y w h objectness probs...
 *
 * Usage: parity_shim <cfg> <weights> <image> <outdir> [thresh] [nms]
 *   nms: "none" (default), "obj:T" (detector f1 protocol, box.c:21-55),
 *        "sort:T" (detector test protocol, box.c:58-88)
 *
 * F1 LIST MODE: when <image> ends in ".txt" it is an image LIST and the shim
 * runs the reference's own detector-f1 protocol (validate_detector_f1,
 * examples/detector.c:760-876) over it — split quantization preprocessing
 * (quantization_weights_preprocess once + per-image
 * quantization_activations_preprocess), get_network_boxes at each threshold
 * 0.1..0.6, do_nms_obj(classes=1, nms=.1), label lookup via
 * find_replace(images->labels, .jpg->.txt), and the exact TP/TP_FP/TP_FN
 * counting (TP_FP = ALL returned boxes incl. NMS-zeroed; TP = truths whose
 * best IoU among boxes with objectness>thre exceeds .1).  Writes
 * crossf1.txt: "thre TP TP_FP TP_FN proposals avg_iou_sum" per threshold.
 * The reference's in-loop free_net use-after-free is not reproduced.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "darknet.h"

/* The reference's SPLIT preprocessing path (what validate_detector_f1 uses)
 * carries two latent bugs vs the combined quantization_weights_and_activations
 * path (src/blas.c:259-345), which is the path its uint8 GEMM was actually
 * validated with:
 *   1. quantization_weights_preprocess (blas.c:171-211) fills
 *      zero_point_int16 but NEVER zero_point_uint8 — the per-weight
 *      zero-point plane the uint8 kernels read stays calloc'd zero, so every
 *      conv's zp correction is wrong and detections are spatial garbage.
 *   2. quantization_activations_preprocess (blas.c:236-238) ACCUMULATES
 *      weights_sum_int with += and then overwrites it with a transformed
 *      value; on the second call (second image) the accumulation starts from
 *      the transformed value, corrupting every image after the first.
 * Both are patched here, harness-side, so the shim's f1 list mode computes
 * what the reference's combined path computes — per-image input
 * requantization included.  (The reference's own f1 runs presumably used the
 * int16 MKL kernels, which read zero_point_int16 and predate bug 1.)
 */
static void patch_split_weight_zp(network *net) {
    for (int i = 0; i < net->n; ++i) {
        layer *l = &net->layers[i];
        if (l->type != CONVOLUTIONAL || !l->layer_quant_flag) continue;
        for (int j = 0; j < l->n; ++j)
            for (int ji = 0; ji < l->c * l->size * l->size; ++ji)
                l->zero_point_uint8[j * l->c * l->size * l->size + ji] =
                    l->weight_data_uint8_zero_point[j];
    }
}

static void reset_weights_sum(network *net) {
    for (int i = 0; i < net->n; ++i) {
        layer *l = &net->layers[i];
        if (l->type != CONVOLUTIONAL || !l->layer_quant_flag) continue;
        for (int j = 0; j < l->n; ++j) l->weights_sum_int[j] = 0;
    }
}

static int run_f1_list(char *cfgfile, char *weightfile, char *listfile,
                       char *outdir) {
    network *net = load_network(cfgfile, weightfile, 0);
    set_batch_network(net, 1);
    printf("\nQuantinization ...\n");
    quantization_weights_preprocess(net);
    patch_split_weight_zp(net);
    printf("Quantinization Complete...\n\n");

    list *plist = get_paths(listfile);
    char **paths = (char **)list_to_array(plist);
    int m = plist->size;

    char outpath[4096];
    snprintf(outpath, sizeof(outpath), "%s/crossf1.txt", outdir);
    FILE *fp = fopen(outpath, "w");
    if (!fp) { fprintf(stderr, "cannot open %s\n", outpath); return 1; }

    for (float thre = 0.1f; thre < 0.7f; thre = thre + 0.1f) {
        float iou_thresh = .1f;
        float nms = .1f;
        int TP_FN = 0, TP_FP = 0, TP = 0, proposals = 0;
        float avg_iou = 0;
        for (int i = 0; i < m; ++i) {
            char *path = paths[i];
            image im = load_image_color(path, 0, 0);
            image sized = letterbox_image(im, net->w, net->h);
            float *X = sized.data;
            reset_weights_sum(net);
            quantization_activations_preprocess(net, X);
            network_predict(net, X);
            int nboxes = 0;
            detection *dets = get_network_boxes(net, im.w, im.h, thre, 0.5f,
                                                0, 1, &nboxes);
            if (nms) do_nms_obj(dets, nboxes, 1, nms);

            char labelpath[4096];
            find_replace(path, "images", "labels", labelpath);
            find_replace(labelpath, "JPEGImages", "labels", labelpath);
            find_replace(labelpath, ".jpg", ".txt", labelpath);
            find_replace(labelpath, ".JPEG", ".txt", labelpath);

            int num_labels = 0;
            box_label *truth = read_boxes(labelpath, &num_labels);
            for (int k = 0; k < nboxes; ++k)
                if (dets[k].objectness > thre) ++proposals;
            for (int k = 0; k < nboxes; ++k) TP_FP++;
            for (int j = 0; j < num_labels; ++j) {
                ++TP_FN;
                box t = {truth[j].x, truth[j].y, truth[j].w, truth[j].h};
                float best_iou = 0;
                for (int k = 0; k < nboxes; ++k) {
                    float iou = box_iou(dets[k].bbox, t);
                    if (dets[k].objectness > thre && iou > best_iou)
                        best_iou = iou;
                }
                avg_iou += best_iou;
                if (best_iou > iou_thresh) ++TP;
            }
            free(truth);
            free_image(im);
            free_image(sized);
            free_detections(dets, nboxes);
        }
        fprintf(fp, "%.1f %d %d %d %d %.9g\n",
                thre, TP, TP_FP, TP_FN, proposals, avg_iou);
        fprintf(stderr, "thre %.1f: TP %d TP_FP %d TP_FN %d F1 %.2f\n",
                thre, TP, TP_FP, TP_FN,
                100.f * 2 * TP / (float)(TP_FP + TP_FN > 0 ? TP_FP + TP_FN : 1));
    }
    fclose(fp);
    fprintf(stderr, "parity_shim: wrote %s\n", outpath);
    return 0;
}

static void dump_bytes(const char *dir, const char *name, const void *p, size_t n) {
    char path[4096];
    snprintf(path, sizeof(path), "%s/%s", dir, name);
    FILE *f = fopen(path, "wb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
    fwrite(p, 1, n, f);
    fclose(f);
}

int main(int argc, char **argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: %s cfg weights image outdir [thresh] [nms]\n", argv[0]);
        return 2;
    }
    char *cfgfile = argv[1], *weightfile = argv[2], *imgfile = argv[3], *outdir = argv[4];
    float thresh = argc > 5 ? atof(argv[5]) : 0.25f;
    const char *nms_mode = argc > 6 ? argv[6] : "none";

    size_t ilen = strlen(imgfile);
    if (ilen > 4 && !strcmp(imgfile + ilen - 4, ".txt"))
        return run_f1_list(cfgfile, weightfile, imgfile, outdir);

    network *net = load_network(cfgfile, weightfile, 0);
    set_batch_network(net, 1);

    image im = load_image_color(imgfile, 0, 0);
    image sized = letterbox_image(im, net->w, net->h);
    dump_bytes(outdir, "sized.bin", sized.data,
               (size_t)sized.w * sized.h * sized.c * sizeof(float));

    net->input = sized.data;
    quantization_weights_and_activations(net);
    if (net->input_uint8)
        dump_bytes(outdir, "input_u8.bin", net->input_uint8,
                   (size_t)net->w * net->h * net->c);

    network_predict(net, sized.data);

    char path[4096], name[64];
    snprintf(path, sizeof(path), "%s/meta.txt", outdir);
    FILE *meta = fopen(path, "w");
    for (int i = 0; i < net->n; ++i) {
        layer l = net->layers[i];
        fprintf(meta, "%d %d %d %d %d %d %d %d %.9g %d %.9g %d\n",
                i, (int)l.type, l.out_w, l.out_h, l.out_c, l.outputs,
                l.layer_quant_flag, l.quant_stop_flag,
                l.activ_data_uint8_scales ? l.activ_data_uint8_scales[0] : 0.0f,
                l.activ_data_uint8_zero_point ? (int)l.activ_data_uint8_zero_point[0] : -1,
                l.input_data_uint8_scales ? l.input_data_uint8_scales[0] : 0.0f,
                l.input_data_uint8_zero_point ? (int)l.input_data_uint8_zero_point[0] : -1);
        if (l.layer_quant_flag && l.output_uint8_final) {
            snprintf(name, sizeof(name), "layer%02d_u8.bin", i);
            dump_bytes(outdir, name, l.output_uint8_final, (size_t)l.outputs);
        }
        if (l.output && (l.type == YOLO || l.quant_stop_flag)) {
            snprintf(name, sizeof(name), "layer%02d_f32.bin", i);
            dump_bytes(outdir, name, l.output, (size_t)l.outputs * sizeof(float));
        }
    }
    fclose(meta);

    layer last = net->layers[net->n - 1];
    int nboxes = 0;
    detection *dets = get_network_boxes(net, im.w, im.h, thresh, 0.5f, 0, 1, &nboxes);
    if (!strncmp(nms_mode, "obj:", 4)) do_nms_obj(dets, nboxes, last.classes, atof(nms_mode + 4));
    else if (!strncmp(nms_mode, "sort:", 5)) do_nms_sort(dets, nboxes, last.classes, atof(nms_mode + 5));

    snprintf(path, sizeof(path), "%s/detections.txt", outdir);
    FILE *df = fopen(path, "w");
    for (int k = 0; k < nboxes; ++k) {
        fprintf(df, "%.9g %.9g %.9g %.9g %.9g",
                dets[k].bbox.x, dets[k].bbox.y, dets[k].bbox.w, dets[k].bbox.h,
                dets[k].objectness);
        for (int c = 0; c < last.classes; ++c) fprintf(df, " %.9g", dets[k].prob[c]);
        fprintf(df, "\n");
    }
    fclose(df);
    free_detections(dets, nboxes);
    fprintf(stderr, "parity_shim: dumped %d layers, %d boxes to %s\n",
            net->n, nboxes, outdir);
    return 0;
}
