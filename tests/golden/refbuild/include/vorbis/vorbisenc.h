/* Empty placeholder: output.cpp includes <vorbis/vorbisenc.h> but uses no vorbis symbols. */
#ifndef SHIM_VORBISENC_H
#define SHIM_VORBISENC_H
#endif
