// Native AVI (RIFF) muxer: MJPEG video stream + PCM16 audio stream.
//
// Role in the framework: the reference delegates audio muxing to an ffmpeg binary
// (gance/image_sources/video_common.py:24-79, `add_wavs_to_video`). This machine
// class has no ffmpeg, so the mux capability is provided natively: a single-pass
// RIFF/AVI writer with an idx1 index, fed pre-encoded JPEG frames (cv2.imencode on
// the Python side) and interleaved int16 PCM. Exposed through ctypes via a C ABI.
//
// Build: see native/Makefile (g++ -O2 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct IndexEntry {
    char ckid[4];
    uint32_t flags;
    uint32_t offset;  // relative to the 'movi' fourcc position + 4
    uint32_t length;
};

struct AviContext {
    FILE* file = nullptr;
    int width = 0;
    int height = 0;
    double fps = 30.0;
    int audio_rate = 0;
    int audio_channels = 0;

    long riff_size_pos = 0;
    long avih_total_frames_pos = 0;
    long video_strh_length_pos = 0;
    long audio_strh_length_pos = 0;
    long movi_size_pos = 0;
    long movi_start = 0;  // file offset of the 'movi' fourcc

    uint32_t video_frames = 0;
    uint32_t audio_bytes = 0;
    uint32_t max_chunk = 0;
    std::vector<IndexEntry> index;
};

void put_u16(AviContext* c, uint16_t v) { fwrite(&v, 2, 1, c->file); }
void put_u32(AviContext* c, uint32_t v) { fwrite(&v, 4, 1, c->file); }
void put_4cc(AviContext* c, const char* s) { fwrite(s, 1, 4, c->file); }

void patch_u32(AviContext* c, long pos, uint32_t v) {
    long cur = ftell(c->file);
    fseek(c->file, pos, SEEK_SET);
    fwrite(&v, 4, 1, c->file);
    fseek(c->file, cur, SEEK_SET);
}

constexpr uint32_t AVIF_HASINDEX = 0x00000010;
constexpr uint32_t AVIIF_KEYFRAME = 0x00000010;

void write_header(AviContext* c) {
    const bool has_audio = c->audio_rate > 0 && c->audio_channels > 0;
    const uint32_t streams = has_audio ? 2 : 1;
    const uint16_t block_align =
        has_audio ? static_cast<uint16_t>(2 * c->audio_channels) : 0;

    put_4cc(c, "RIFF");
    c->riff_size_pos = ftell(c->file);
    put_u32(c, 0);  // patched in finalize
    put_4cc(c, "AVI ");

    // ---- hdrl ----
    const uint32_t strl_video = 4 + 8 + 56 + 8 + 40;              // 'strl' strh strf
    const uint32_t strl_audio = has_audio ? (4 + 8 + 56 + 8 + 18) : 0;
    uint32_t hdrl_size = 4 + 8 + 56 + 8 + strl_video;             // 'hdrl' avih LIST(strl)
    if (has_audio) hdrl_size += 8 + strl_audio;

    put_4cc(c, "LIST");
    put_u32(c, hdrl_size);
    put_4cc(c, "hdrl");

    // avih
    put_4cc(c, "avih");
    put_u32(c, 56);
    put_u32(c, static_cast<uint32_t>(1000000.0 / c->fps));  // usec per frame
    put_u32(c, 0);                                          // max bytes per sec
    put_u32(c, 0);                                          // padding granularity
    put_u32(c, AVIF_HASINDEX);
    c->avih_total_frames_pos = ftell(c->file);
    put_u32(c, 0);        // total frames (patched)
    put_u32(c, 0);        // initial frames
    put_u32(c, streams);  // streams
    put_u32(c, 0);        // suggested buffer size
    put_u32(c, static_cast<uint32_t>(c->width));
    put_u32(c, static_cast<uint32_t>(c->height));
    for (int i = 0; i < 4; ++i) put_u32(c, 0);

    // ---- video strl ----
    put_4cc(c, "LIST");
    put_u32(c, strl_video);
    put_4cc(c, "strl");
    put_4cc(c, "strh");
    put_u32(c, 56);
    put_4cc(c, "vids");
    put_4cc(c, "MJPG");
    put_u32(c, 0);  // flags
    put_u16(c, 0);  // priority
    put_u16(c, 0);  // language
    put_u32(c, 0);  // initial frames
    // fps = rate/scale with 1e6 scale for fractional rates
    put_u32(c, 1000000);                                      // scale
    put_u32(c, static_cast<uint32_t>(c->fps * 1000000.0));    // rate
    put_u32(c, 0);  // start
    c->video_strh_length_pos = ftell(c->file);
    put_u32(c, 0);           // length in frames (patched)
    put_u32(c, 0);           // suggested buffer size
    put_u32(c, 0xFFFFFFFF);  // quality
    put_u32(c, 0);           // sample size (0 = varying)
    put_u16(c, 0); put_u16(c, 0);
    put_u16(c, static_cast<uint16_t>(c->width));
    put_u16(c, static_cast<uint16_t>(c->height));

    put_4cc(c, "strf");
    put_u32(c, 40);  // BITMAPINFOHEADER
    put_u32(c, 40);
    put_u32(c, static_cast<uint32_t>(c->width));
    put_u32(c, static_cast<uint32_t>(c->height));
    put_u16(c, 1);            // planes
    put_u16(c, 24);           // bit count
    put_4cc(c, "MJPG");       // compression
    put_u32(c, static_cast<uint32_t>(c->width * c->height * 3));
    put_u32(c, 0); put_u32(c, 0); put_u32(c, 0); put_u32(c, 0);

    if (has_audio) {
        put_4cc(c, "LIST");
        put_u32(c, strl_audio);
        put_4cc(c, "strl");
        put_4cc(c, "strh");
        put_u32(c, 56);
        put_4cc(c, "auds");
        put_u32(c, 0);  // handler
        put_u32(c, 0);  // flags
        put_u16(c, 0); put_u16(c, 0);
        put_u32(c, 0);                      // initial frames
        put_u32(c, block_align);            // scale
        put_u32(c, static_cast<uint32_t>(c->audio_rate) * block_align);  // rate
        put_u32(c, 0);                      // start
        c->audio_strh_length_pos = ftell(c->file);
        put_u32(c, 0);                      // length in blocks (patched)
        put_u32(c, 0);                      // suggested buffer
        put_u32(c, 0xFFFFFFFF);             // quality
        put_u32(c, block_align);            // sample size
        put_u16(c, 0); put_u16(c, 0); put_u16(c, 0); put_u16(c, 0);

        put_4cc(c, "strf");
        put_u32(c, 18);  // WAVEFORMATEX with cbSize
        put_u16(c, 1);   // PCM
        put_u16(c, static_cast<uint16_t>(c->audio_channels));
        put_u32(c, static_cast<uint32_t>(c->audio_rate));
        put_u32(c, static_cast<uint32_t>(c->audio_rate) * block_align);
        put_u16(c, block_align);
        put_u16(c, 16);  // bits per sample
        put_u16(c, 0);   // cbSize
    }

    // ---- movi ----
    put_4cc(c, "LIST");
    c->movi_size_pos = ftell(c->file);
    put_u32(c, 0);  // patched
    c->movi_start = ftell(c->file);
    put_4cc(c, "movi");
}

void write_chunk(AviContext* c, const char* ckid, const uint8_t* data, uint32_t n,
                 uint32_t flags) {
    IndexEntry e{};
    memcpy(e.ckid, ckid, 4);
    e.flags = flags;
    e.offset = static_cast<uint32_t>(ftell(c->file) - c->movi_start);
    e.length = n;
    c->index.push_back(e);

    put_4cc(c, ckid);
    put_u32(c, n);
    fwrite(data, 1, n, c->file);
    if (n & 1) fputc(0, c->file);  // even padding
    if (n > c->max_chunk) c->max_chunk = n;
}

}  // namespace

extern "C" {

void* avi_create(const char* path, int width, int height, double fps,
                 int audio_rate, int audio_channels) {
    FILE* f = fopen(path, "wb");
    if (!f) return nullptr;
    auto* c = new AviContext();
    c->file = f;
    c->width = width;
    c->height = height;
    c->fps = fps;
    c->audio_rate = audio_rate;
    c->audio_channels = audio_channels;
    write_header(c);
    return c;
}

int avi_write_video_frame(void* ctx, const uint8_t* jpeg, int nbytes) {
    auto* c = static_cast<AviContext*>(ctx);
    if (!c || !c->file || nbytes <= 0) return -1;
    write_chunk(c, "00dc", jpeg, static_cast<uint32_t>(nbytes), AVIIF_KEYFRAME);
    c->video_frames += 1;
    return 0;
}

int avi_write_audio(void* ctx, const int16_t* samples, int nsamples) {
    auto* c = static_cast<AviContext*>(ctx);
    if (!c || !c->file || nsamples <= 0) return -1;
    const uint32_t nbytes = static_cast<uint32_t>(nsamples) * 2;
    write_chunk(c, "01wb", reinterpret_cast<const uint8_t*>(samples), nbytes, 0);
    c->audio_bytes += nbytes;
    return 0;
}

int avi_finalize(void* ctx) {
    auto* c = static_cast<AviContext*>(ctx);
    if (!c || !c->file) return -1;

    // idx1
    const long movi_end = ftell(c->file);
    put_4cc(c, "idx1");
    put_u32(c, static_cast<uint32_t>(c->index.size() * 16));
    for (const auto& e : c->index) {
        fwrite(e.ckid, 1, 4, c->file);
        put_u32(c, e.flags);
        put_u32(c, e.offset);
        put_u32(c, e.length);
    }
    const long file_end = ftell(c->file);

    patch_u32(c, c->riff_size_pos, static_cast<uint32_t>(file_end - 8));
    patch_u32(c, c->avih_total_frames_pos, c->video_frames);
    patch_u32(c, c->video_strh_length_pos, c->video_frames);
    if (c->audio_strh_length_pos) {
        const uint32_t block_align = 2 * c->audio_channels;
        patch_u32(c, c->audio_strh_length_pos,
                  block_align ? c->audio_bytes / block_align : 0);
    }
    patch_u32(c, c->movi_size_pos, static_cast<uint32_t>(movi_end - c->movi_start) + 0);

    fclose(c->file);
    c->file = nullptr;
    delete c;
    return 0;
}

}  // extern "C"
