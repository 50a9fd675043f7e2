// Native AVI (RIFF) muxer: MJPEG or uncompressed (BI_RGB) video + PCM16 audio.
//
// Role in the framework: the reference delegates audio muxing to an ffmpeg binary
// (gance/image_sources/video_common.py:24-79, `add_wavs_to_video`). This machine
// class has no ffmpeg, so the mux capability is provided natively: a single-pass
// RIFF/AVI writer with an idx1 index, fed pre-encoded JPEG frames (cv2.imencode on
// the Python side) or raw RGB frames (spill mode). Exposed through ctypes via a
// C ABI.
//
// I/O path: all bytes go through an append-only 8 MiB aligned buffer that can be
// flushed with O_DIRECT. Measured on the production host (one core, virtio disk):
// buffered writes are writeback-throttled to ~51 MB/s while O_DIRECT sustains
// ~760 MB/s — the difference between ~4 f/s and ~50 f/s of 2160px raw egress.
// Header back-patches (sizes, frame counts) are deferred: patches landing inside
// the unflushed buffer are applied in place; earlier ones are recorded and
// pwrite()n once at finalize after dropping O_DIRECT.
//
// Raw mode writes top-down rows via a negative biHeight (avoids a row flip per
// frame; ffmpeg/cv2 honor it), converting RGB -> BGR during the buffer copy.
//
// Build: see native/Makefile (g++ -O2 -shared -fPIC).

#include <fcntl.h>
#include <unistd.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <utility>
#include <vector>

namespace {

constexpr size_t kBufCap = size_t{8} << 20;  // 8 MiB; multiple of any block size

struct Writer {
    int fd = -1;
    bool direct = false;
    uint8_t* buf = nullptr;
    size_t fill = 0;
    uint64_t flushed = 0;  // bytes already written to disk
    std::vector<std::pair<uint64_t, uint32_t>> deferred_patches;
    bool failed = false;
};

bool writer_open(Writer* w, const char* path, bool direct_io) {
    int flags = O_WRONLY | O_CREAT | O_TRUNC;
    w->direct = false;
    if (direct_io) {
        w->fd = open(path, flags | O_DIRECT, 0644);
        if (w->fd >= 0) w->direct = true;
    }
    if (w->fd < 0) w->fd = open(path, flags, 0644);  // fallback: buffered
    if (w->fd < 0) return false;
    if (posix_memalign(reinterpret_cast<void**>(&w->buf), 4096, kBufCap) != 0) {
        close(w->fd);
        w->fd = -1;
        return false;
    }
    return true;
}

void writer_flush_block(Writer* w) {
    // Only called with a FULL buffer: kBufCap is aligned for O_DIRECT.
    size_t done = 0;
    while (done < kBufCap) {
        ssize_t n = write(w->fd, w->buf + done, kBufCap - done);
        if (n <= 0) {
            w->failed = true;
            return;
        }
        done += static_cast<size_t>(n);
    }
    w->flushed += kBufCap;
    w->fill = 0;
}

void writer_put(Writer* w, const void* data, size_t n) {
    const uint8_t* src = static_cast<const uint8_t*>(data);
    while (n > 0 && !w->failed) {
        size_t room = kBufCap - w->fill;
        size_t take = n < room ? n : room;
        memcpy(w->buf + w->fill, src, take);
        w->fill += take;
        src += take;
        n -= take;
        if (w->fill == kBufCap) writer_flush_block(w);
    }
}

uint64_t writer_tell(const Writer* w) { return w->flushed + w->fill; }

void writer_patch_u32(Writer* w, uint64_t pos, uint32_t v) {
    if (pos >= w->flushed) {
        memcpy(w->buf + (pos - w->flushed), &v, 4);
    } else {
        w->deferred_patches.emplace_back(pos, v);
    }
}

bool writer_close(Writer* w) {
    bool ok = !w->failed;
    if (w->fd >= 0) {
        if (w->direct) {
            int flags = fcntl(w->fd, F_GETFL);
            fcntl(w->fd, F_SETFL, flags & ~O_DIRECT);
        }
        // Tail flush (arbitrary size, now buffered) then the deferred patches.
        size_t done = 0;
        while (done < w->fill) {
            ssize_t n = write(w->fd, w->buf + done, w->fill - done);
            if (n <= 0) {
                ok = false;
                break;
            }
            done += static_cast<size_t>(n);
        }
        for (const auto& patch : w->deferred_patches) {
            if (pwrite(w->fd, &patch.second, 4, static_cast<off_t>(patch.first)) != 4)
                ok = false;
        }
        close(w->fd);
        w->fd = -1;
    }
    free(w->buf);
    w->buf = nullptr;
    return ok;
}

struct IndexEntry {
    char ckid[4];
    uint32_t flags;
    uint32_t offset;  // relative to the 'movi' fourcc position + 4
    uint32_t length;
};

struct AviContext {
    Writer writer;
    int width = 0;
    int height = 0;
    double fps = 30.0;
    int audio_rate = 0;
    int audio_channels = 0;
    bool raw_rgb = false;  // uncompressed BI_RGB stream instead of MJPEG

    uint64_t riff_size_pos = 0;
    uint64_t avih_total_frames_pos = 0;
    uint64_t video_strh_length_pos = 0;
    uint64_t audio_strh_length_pos = 0;
    uint64_t movi_size_pos = 0;
    uint64_t movi_start = 0;  // file offset of the 'movi' fourcc

    uint32_t video_frames = 0;
    uint32_t audio_bytes = 0;
    uint32_t max_chunk = 0;
    std::vector<IndexEntry> index;
    std::vector<uint8_t> row_scratch;  // raw mode: one BGR row (stride padded)
};

void put_u16(AviContext* c, uint16_t v) { writer_put(&c->writer, &v, 2); }
void put_u32(AviContext* c, uint32_t v) { writer_put(&c->writer, &v, 4); }
void put_i32(AviContext* c, int32_t v) { writer_put(&c->writer, &v, 4); }
void put_4cc(AviContext* c, const char* s) { writer_put(&c->writer, s, 4); }

constexpr uint32_t AVIF_HASINDEX = 0x00000010;
constexpr uint32_t AVIIF_KEYFRAME = 0x00000010;

uint32_t raw_row_stride(int width) {
    return (static_cast<uint32_t>(width) * 3 + 3) & ~3u;  // DWORD-aligned DIB rows
}

void write_header(AviContext* c) {
    const bool has_audio = c->audio_rate > 0 && c->audio_channels > 0;
    const uint32_t streams = has_audio ? 2 : 1;
    const uint16_t block_align =
        has_audio ? static_cast<uint16_t>(2 * c->audio_channels) : 0;
    const uint32_t frame_bytes =
        c->raw_rgb ? raw_row_stride(c->width) * static_cast<uint32_t>(c->height)
                   : static_cast<uint32_t>(c->width * c->height * 3);

    put_4cc(c, "RIFF");
    c->riff_size_pos = writer_tell(&c->writer);
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
    c->avih_total_frames_pos = writer_tell(&c->writer);
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
    if (c->raw_rgb) {
        put_u32(c, 0);  // no handler fourcc for raw DIB
    } else {
        put_4cc(c, "MJPG");
    }
    put_u32(c, 0);  // flags
    put_u16(c, 0);  // priority
    put_u16(c, 0);  // language
    put_u32(c, 0);  // initial frames
    // fps = rate/scale with 1e6 scale for fractional rates
    put_u32(c, 1000000);                                      // scale
    put_u32(c, static_cast<uint32_t>(c->fps * 1000000.0));    // rate
    put_u32(c, 0);  // start
    c->video_strh_length_pos = writer_tell(&c->writer);
    put_u32(c, 0);            // length in frames (patched)
    put_u32(c, frame_bytes);  // suggested buffer size
    put_u32(c, 0xFFFFFFFF);   // quality
    put_u32(c, 0);            // sample size (0 = varying)
    put_u16(c, 0); put_u16(c, 0);
    put_u16(c, static_cast<uint16_t>(c->width));
    put_u16(c, static_cast<uint16_t>(c->height));

    put_4cc(c, "strf");
    put_u32(c, 40);  // BITMAPINFOHEADER
    put_u32(c, 40);
    put_u32(c, static_cast<uint32_t>(c->width));
    if (c->raw_rgb) {
        put_i32(c, -c->height);  // negative = top-down rows (no flip per frame)
    } else {
        put_u32(c, static_cast<uint32_t>(c->height));
    }
    put_u16(c, 1);            // planes
    put_u16(c, 24);           // bit count
    if (c->raw_rgb) {
        put_u32(c, 0);        // BI_RGB (uncompressed)
    } else {
        put_4cc(c, "MJPG");   // compression
    }
    put_u32(c, frame_bytes);
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
        c->audio_strh_length_pos = writer_tell(&c->writer);
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
    c->movi_size_pos = writer_tell(&c->writer);
    put_u32(c, 0);  // patched
    c->movi_start = writer_tell(&c->writer);
    put_4cc(c, "movi");
}

void begin_chunk(AviContext* c, const char* ckid, uint32_t n, uint32_t flags) {
    IndexEntry e{};
    memcpy(e.ckid, ckid, 4);
    e.flags = flags;
    e.offset = static_cast<uint32_t>(writer_tell(&c->writer) - c->movi_start);
    e.length = n;
    c->index.push_back(e);
    put_4cc(c, ckid);
    put_u32(c, n);
    if (n > c->max_chunk) c->max_chunk = n;
}

void write_chunk(AviContext* c, const char* ckid, const uint8_t* data, uint32_t n,
                 uint32_t flags) {
    begin_chunk(c, ckid, n, flags);
    writer_put(&c->writer, data, n);
    if (n & 1) {
        const uint8_t pad = 0;
        writer_put(&c->writer, &pad, 1);
    }
}

}  // namespace

extern "C" {

void* avi_create_ex(const char* path, int width, int height, double fps,
                    int audio_rate, int audio_channels, int raw_rgb,
                    int direct_io) {
    auto* c = new AviContext();
    if (!writer_open(&c->writer, path, direct_io != 0)) {
        delete c;
        return nullptr;
    }
    c->width = width;
    c->height = height;
    c->fps = fps;
    c->audio_rate = audio_rate;
    c->audio_channels = audio_channels;
    c->raw_rgb = raw_rgb != 0;
    if (c->raw_rgb) c->row_scratch.resize(raw_row_stride(width), 0);
    write_header(c);
    return c;
}

void* avi_create(const char* path, int width, int height, double fps,
                 int audio_rate, int audio_channels) {
    return avi_create_ex(path, width, height, fps, audio_rate, audio_channels,
                         /*raw_rgb=*/0, /*direct_io=*/0);
}

int avi_write_video_frame(void* ctx, const uint8_t* jpeg, int nbytes) {
    auto* c = static_cast<AviContext*>(ctx);
    if (!c || c->writer.fd < 0 || nbytes <= 0 || c->raw_rgb) return -1;
    write_chunk(c, "00dc", jpeg, static_cast<uint32_t>(nbytes), AVIIF_KEYFRAME);
    c->video_frames += 1;
    return c->writer.failed ? -1 : 0;
}

// Raw mode: append one top-down RGB frame (H*W*3 bytes), converting to the
// container's BGR order during the buffer copy (one pass, no extra allocation).
int avi_write_video_frame_raw_rgb(void* ctx, const uint8_t* rgb) {
    auto* c = static_cast<AviContext*>(ctx);
    if (!c || c->writer.fd < 0 || !c->raw_rgb) return -1;
    const uint32_t stride = raw_row_stride(c->width);
    const uint32_t n = stride * static_cast<uint32_t>(c->height);
    begin_chunk(c, "00db", n, AVIIF_KEYFRAME);
    uint8_t* row = c->row_scratch.data();
    const int w = c->width;
    for (int y = 0; y < c->height; ++y) {
        const uint8_t* src = rgb + static_cast<size_t>(y) * w * 3;
        for (int x = 0; x < w; ++x) {
            row[x * 3 + 0] = src[x * 3 + 2];
            row[x * 3 + 1] = src[x * 3 + 1];
            row[x * 3 + 2] = src[x * 3 + 0];
        }
        writer_put(&c->writer, row, stride);
    }
    c->video_frames += 1;
    return c->writer.failed ? -1 : 0;
}

// Raw mode zero-transform path for frames the producer already laid out as
// top-down BGR (e.g. channel-swizzled on the TPU before egress): pure memcpy.
int avi_write_video_frame_raw_bgr(void* ctx, const uint8_t* bgr) {
    auto* c = static_cast<AviContext*>(ctx);
    if (!c || c->writer.fd < 0 || !c->raw_rgb) return -1;
    const uint32_t stride = raw_row_stride(c->width);
    const uint32_t n = stride * static_cast<uint32_t>(c->height);
    begin_chunk(c, "00db", n, AVIIF_KEYFRAME);
    const uint32_t row_bytes = static_cast<uint32_t>(c->width) * 3;
    if (stride == row_bytes) {
        writer_put(&c->writer, bgr, n);
    } else {
        uint8_t* row = c->row_scratch.data();
        for (int y = 0; y < c->height; ++y) {
            memcpy(row, bgr + static_cast<size_t>(y) * row_bytes, row_bytes);
            writer_put(&c->writer, row, stride);
        }
    }
    c->video_frames += 1;
    return c->writer.failed ? -1 : 0;
}

int avi_write_audio(void* ctx, const int16_t* samples, int nsamples) {
    auto* c = static_cast<AviContext*>(ctx);
    if (!c || c->writer.fd < 0 || nsamples <= 0) return -1;
    const uint32_t nbytes = static_cast<uint32_t>(nsamples) * 2;
    write_chunk(c, "01wb", reinterpret_cast<const uint8_t*>(samples), nbytes, 0);
    c->audio_bytes += nbytes;
    return c->writer.failed ? -1 : 0;
}

// Bytes this file would occupy after finalize with the current content —
// lets the caller segment raw spills below the AVI 4 GiB RIFF limit.
int64_t avi_bytes_written(void* ctx) {
    auto* c = static_cast<AviContext*>(ctx);
    if (!c) return -1;
    return static_cast<int64_t>(writer_tell(&c->writer)) + 8 +
           static_cast<int64_t>(c->index.size()) * 16;
}

int avi_finalize(void* ctx) {
    auto* c = static_cast<AviContext*>(ctx);
    if (!c || c->writer.fd < 0) return -1;

    // idx1
    const uint64_t movi_end = writer_tell(&c->writer);
    put_4cc(c, "idx1");
    put_u32(c, static_cast<uint32_t>(c->index.size() * 16));
    for (const auto& e : c->index) {
        writer_put(&c->writer, e.ckid, 4);
        put_u32(c, e.flags);
        put_u32(c, e.offset);
        put_u32(c, e.length);
    }
    const uint64_t file_end = writer_tell(&c->writer);

    writer_patch_u32(&c->writer, c->riff_size_pos,
                     static_cast<uint32_t>(file_end - 8));
    writer_patch_u32(&c->writer, c->avih_total_frames_pos, c->video_frames);
    writer_patch_u32(&c->writer, c->video_strh_length_pos, c->video_frames);
    if (c->audio_strh_length_pos) {
        const uint32_t block_align = 2 * c->audio_channels;
        writer_patch_u32(&c->writer, c->audio_strh_length_pos,
                         block_align ? c->audio_bytes / block_align : 0);
    }
    writer_patch_u32(&c->writer, c->movi_size_pos,
                     static_cast<uint32_t>(movi_end - c->movi_start));

    const bool ok = writer_close(&c->writer);
    delete c;
    return ok ? 0 : -1;
}

}  // extern "C"
