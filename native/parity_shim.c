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
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "darknet.h"

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
