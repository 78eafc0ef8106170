// Compiles the unmodified reference plugin source (by absolute path — never
// copied into this repo) against the JUCE stub, to serve as a null-test oracle.
#define JucePlugin_Name "Juicy Texture"
#define createPluginFilter createPluginFilter_texture
#include "/root/reference/src/plugins/JuicyTexture/PluginProcessor.cpp"
