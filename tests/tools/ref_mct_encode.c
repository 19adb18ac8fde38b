/* Interop helper: encode a raw planar uint8 image with a Part-2 custom
 * MCT through the reference library API (grk_set_MCT), bypassing the
 * reference CLI whose -m path crashes (grk_compress.cpp:1460
 * `cleanup: if (!lFile) fclose(lFile)` — fclose(NULL) on success).
 *
 * Usage: ref_mct_encode <in.raw> <w> <h> <ncomps> <mct.txt> <out.j2k>
 * mct.txt: ncomps*ncomps floats (coding matrix) then ncomps ints (dc
 * shifts), whitespace-separated — same content as the reference -m file
 * (grk_compress.cpp:1386-1457).
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdbool.h>
#include <string.h>
#include "grok.h"

int main(int argc, char **argv) {
    if (argc != 7) {
        fprintf(stderr, "usage: %s in.raw w h ncomps mct.txt out.j2k\n",
                argv[0]);
        return 2;
    }
    const char *in_path = argv[1];
    uint32_t w = (uint32_t)atoi(argv[2]);
    uint32_t h = (uint32_t)atoi(argv[3]);
    uint32_t nc = (uint32_t)atoi(argv[4]);
    const char *mct_path = argv[5];
    const char *out_path = argv[6];

    float *mat = (float*)malloc(sizeof(float) * nc * nc);
    int32_t *shift = (int32_t*)malloc(sizeof(int32_t) * nc);
    FILE *mf = fopen(mct_path, "r");
    if (!mf) { perror("mct"); return 2; }
    for (uint32_t i = 0; i < nc * nc; i++)
        if (fscanf(mf, "%f", &mat[i]) != 1) return 2;
    for (uint32_t i = 0; i < nc; i++)
        if (fscanf(mf, "%d", &shift[i]) != 1) return 2;
    fclose(mf);

    size_t npix = (size_t)w * h;
    uint8_t *raw = (uint8_t*)malloc(npix * nc);
    FILE *rf = fopen(in_path, "rb");
    if (!rf || fread(raw, 1, npix * nc, rf) != npix * nc) {
        fprintf(stderr, "raw read failed\n");
        return 2;
    }
    fclose(rf);

    grk_initialize(NULL, 1);

    grk_cparameters params;
    grk_set_default_encoder_parameters(&params);
    params.irreversible = true;   /* custom MCT requires 9/7 */
    params.numresolution = 4;
    params.tcp_mct = 2;
    params.cod_format = GRK_J2K_FMT;
    if (!grk_set_MCT(&params, mat, shift, nc)) {
        fprintf(stderr, "grk_set_MCT failed\n");
        return 1;
    }

    grk_image_cmptparm cmpt[8];
    memset(cmpt, 0, sizeof(cmpt));
    for (uint32_t c = 0; c < nc; c++) {
        cmpt[c].dx = 1; cmpt[c].dy = 1;
        cmpt[c].w = w; cmpt[c].h = h;
        cmpt[c].x0 = 0; cmpt[c].y0 = 0;
        cmpt[c].prec = 8; cmpt[c].sgnd = 0;
    }
    grk_image *image = grk_image_create(nc, cmpt, GRK_CLRSPC_SRGB);
    if (!image) { fprintf(stderr, "image_create failed\n"); return 1; }
    image->x0 = 0; image->y0 = 0; image->x1 = w; image->y1 = h;
    for (uint32_t c = 0; c < nc; c++)
        for (size_t i = 0; i < npix; i++)
            image->comps[c].data[i] = raw[c * npix + i];

    grk_stream *stream =
        grk_stream_create_file_stream(out_path, 1 << 20, false);
    grk_codec *codec = grk_create_compress(GRK_CODEC_J2K, stream);
    if (!grk_setup_encoder(codec, &params, image)) {
        fprintf(stderr, "setup_encoder failed\n");
        return 1;
    }
    if (!grk_start_compress(codec, image)) {
        fprintf(stderr, "start_compress failed\n");
        return 1;
    }
    if (!grk_encode(codec)) {
        fprintf(stderr, "encode failed\n");
        return 1;
    }
    if (!grk_end_compress(codec)) {
        fprintf(stderr, "end_compress failed\n");
        return 1;
    }
    grk_destroy_codec(codec);
    grk_stream_destroy(stream);
    grk_image_destroy(image);
    grk_deinitialize();
    return 0;
}
